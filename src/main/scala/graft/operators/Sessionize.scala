package graft.operators

import graft.operators.Ckpt.CkptOps
import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Sessionization of the events table: consecutive events of a user with
  * inter-event gap ≤ `gapSeconds` form one session. The reference has no
  * event analytics at all (its events are request logs,
  * `/root/reference/backend/logs/11-16-2025.log`); this is the standard
  * operator a 100 TB behavioral pipeline needs, in both batch and
  * streaming form.
  *
  * Scale notes:
  *  - Batch: one shuffle on user_id (window + groupBy share the
  *    partitioning — Catalyst reuses the exchange), state bounded per
  *    user-partition. Timestamps are truncated to whole seconds so the
  *    DuckDB oracle reproduces the exact boundaries.
  *  - Streaming: flatMapGroupsWithState with an event-time timeout —
  *    state per user is ONE open session (constant size), closed sessions
  *    are emitted as soon as the gap or the watermark passes. This is the
  *    only shape whose state does not grow with the stream.
  */
object Sessionize {

  val DefaultGapSeconds = 21600L // 6 h — fixture median inter-event gap ~7.3 h

  /** Batch sessions: (user_id, session_idx, start_s, end_s, n_events,
    * sum_value), session_idx 1-based in time order per user. */
  /** Top session PATHS: the first `maxSteps` event types of each
    * session joined with '>', with session counts and conversion
    * rates — the "how do people actually move through the product"
    * funnel explorer. Path material is bounded BEFORE aggregation
    * (rows filtered to step ≤ maxSteps, then sort_array over ≤
    * maxSteps structs — a hot session can't blow the collect);
    * conversion (any purchase ANYWHERE in the session) aggregates
    * separately over the full session and joins back on the session
    * key. All counts integer, rates truncated ppm, top-k by
    * (n desc, path asc) via TakeOrdered. Returns
    * (path, n_sessions, conv_ppm). */
  def topPaths(events: DataFrame, gapSeconds: Long = DefaultGapSeconds,
      maxSteps: Int = 5, topK: Int = 20): DataFrame = {
    require(maxSteps >= 1 && topK >= 1)
    val w = Window.partitionBy("user_id").orderBy(col("s").asc,
      col("event_id").asc)
    val sess = events
      .select(col("user_id"), col("event_id"),
        col("event_type").as("et"),
        unix_timestamp(date_trunc("second", col("ts"))).as("s"))
      .withColumn("prev_s", lag(col("s"), 1).over(w))
      .withColumn("new_s",
        when(col("prev_s").isNull ||
          col("s") - col("prev_s") > gapSeconds, 1L).otherwise(0L))
      .withColumn("session_idx", sum(col("new_s")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .graftCheckpoint(true)
    val wS = Window.partitionBy("user_id", "session_idx")
      .orderBy(col("s").asc, col("event_id").asc)
    val stepped = sess.withColumn("rn", row_number().over(wS))
    val paths = stepped.filter(col("rn") <= maxSteps)
      .groupBy("user_id", "session_idx")
      .agg(array_join(transform(
        sort_array(collect_list(struct(col("rn"), col("et")))),
        x => x.getField("et")), ">").as("path"))
    val conv = sess.groupBy("user_id", "session_idx")
      .agg(max(when(col("et") === "purchase", 1L).otherwise(0L))
        .as("cv"))
    paths.join(conv, Seq("user_id", "session_idx"))
      .groupBy("path")
      .agg(count(lit(1)).as("n_sessions"), sum(col("cv")).as("__nc"))
      .select(col("path"), col("n_sessions"),
        expr("(__nc * 1000000) div n_sessions").as("conv_ppm"))
      .orderBy(col("n_sessions").desc, col("path").asc)
      .limit(topK)
  }

  def sessions(events: DataFrame, gapSeconds: Long = DefaultGapSeconds)
      : DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("s").asc,
      col("event_id").asc)
    events
      .select(col("user_id"), col("event_id"), col("value"),
        unix_timestamp(date_trunc("second", col("ts"))).as("s"))
      .withColumn("prev_s", lag(col("s"), 1).over(w))
      .withColumn("new_s",
        when(col("prev_s").isNull ||
          col("s") - col("prev_s") > gapSeconds, 1L).otherwise(0L))
      .withColumn("session_idx", sum(col("new_s")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_idx")
      .agg(min(col("s")).as("start_s"), max(col("s")).as("end_s"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,4)")).cast("double")
          .as("sum_value"))
  }

  /** Open-session state (public: the state encoder's generated code
    * accesses the accessors, which janino can't on a private class). */
  case class Open(startS: Long, endS: Long, n: Long, total: Double)

  /** Closed session emitted by the streaming path. */
  case class Session(user_id: Long, start_s: Long, end_s: Long,
      n_events: Long, sum_value: Double)

  /** Streaming sessionization. Input must be a streaming frame with
    * (user_id, ts, value); caller sets the watermark delay. A session is
    * emitted when a later event of the same user breaks the gap, or when
    * the event-time timeout fires (watermark passed `gapSeconds` beyond
    * the session end — no further event can extend it).
    *
    * Session stats here sum raw doubles (streaming emission order is not
    * deterministic anyway); the batch pass owns oracle-exact numbers.
    */
  def sessionStream(events: DataFrame,
      gapSeconds: Long = DefaultGapSeconds,
      watermark: String = "1 hour"): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .select(col("user_id").cast("long"), col("ts"),
        col("value").cast("double"))
      .withWatermark("ts", watermark)
      .as[(Long, Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Open, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[(Long, Timestamp, Double)],
            state: GroupState[Open]) =>
          if (state.hasTimedOut) {
            // watermark passed end + gap: nothing can extend the session
            val s = state.get
            state.remove()
            Iterator.single(Session(user, s.startS, s.endS, s.n, s.total))
          } else {
            // micro-batch rows arrive unsorted — order within the batch
            val sorted = rows.toArray.sortBy(r => (r._2.getTime, r._3))
            var open   = state.getOption
            val closed = Iterator.newBuilder[Session]
            sorted.foreach { case (_, ts, v) =>
              val sec = ts.getTime / 1000
              open match {
                case Some(o) if sec - o.endS <= gapSeconds =>
                  open = Some(Open(o.startS, math.max(o.endS, sec),
                    o.n + 1, o.total + v))
                case Some(o) =>
                  closed += Session(user, o.startS, o.endS, o.n, o.total)
                  open = Some(Open(sec, sec, 1L, v))
                case None =>
                  open = Some(Open(sec, sec, 1L, v))
              }
            }
            open.foreach { o =>
              state.update(o)
              state.setTimeoutTimestamp((o.endS + gapSeconds) * 1000 + 1)
            }
            closed.result()
          }
      }
  }
}
