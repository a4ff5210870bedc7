package graft.operators

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SessionizeSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def fixture = Seq(
    // user 1: two sessions (gap 7200 s between 11:00 and 14:00 > 3600)
    (1L, 1L, ts("2024-01-01 10:00:00"), 1.5),
    (1L, 2L, ts("2024-01-01 10:30:00"), 2.5),
    (1L, 3L, ts("2024-01-01 11:00:00"), 0.5),
    (1L, 4L, ts("2024-01-01 14:00:00"), 4.0),
    // user 2: one session, single event
    (2L, 5L, ts("2024-01-01 09:00:00"), 1.25),
    // user 3: boundary — gap exactly 3600 s stays ONE session (<=)
    (3L, 6L, ts("2024-01-01 08:00:00"), 1.0),
    (3L, 7L, ts("2024-01-01 09:00:00"), 2.0))

  test("batch sessions: gap splits, boundary gap keeps one session") {
    import spark.implicits._
    val events = fixture.toDF("user_id", "event_id", "ts", "value")
    val out = Sessionize.sessions(events, gapSeconds = 3600L)
      .orderBy("user_id", "session_idx")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))

    val e = (s: String) => ts(s).getTime / 1000
    assert(out.toSeq === Seq(
      (1L, 1L, e("2024-01-01 10:00:00"), e("2024-01-01 11:00:00"), 3L, 4.5),
      (1L, 2L, e("2024-01-01 14:00:00"), e("2024-01-01 14:00:00"), 1L, 4.0),
      (2L, 1L, e("2024-01-01 09:00:00"), e("2024-01-01 09:00:00"), 1L, 1.25),
      (3L, 1L, e("2024-01-01 08:00:00"), e("2024-01-01 09:00:00"), 2L, 3.0)))
  }

  test("streaming sessions close via gap/timeout and agree with batch") {
    import spark.implicits._
    val dir = Files.createTempDirectory("sess_in").toString
    val df  = fixture.toDF("user_id", "event_id", "ts", "value")
    df.select("user_id", "ts", "value").coalesce(1)
      .write.parquet(dir + "/f1")
    // two sentinel batches march the watermark past end+gap of every
    // real session (watermark for batch N = max event time through N-1)
    Seq((-999L, ts("2024-01-03 00:00:00"), 0.0)).toDF("user_id", "ts", "value")
      .coalesce(1).write.parquet(dir + "/f2")
    Seq((-999L, ts("2024-01-05 00:00:00"), 0.0)).toDF("user_id", "ts", "value")
      .coalesce(1).write.parquet(dir + "/f3")
    // one subdir per micro-batch: maxFilesPerTrigger counts files, and
    // each parquet write is (data + _SUCCESS); glob the data files only
    val schema = spark.read.parquet(dir + "/f1").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir + "/f*/part-*.parquet")

    val q = Sessionize.sessionStream(stream, gapSeconds = 3600L,
      watermark = "0 seconds")
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.sql(
      """SELECT user_id, start_s, end_s, n_events, sum_value
        |FROM sessions_out WHERE user_id > 0
        |ORDER BY user_id, start_s""".stripMargin)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))

    val batch = Sessionize.sessions(
      df, gapSeconds = 3600L)
      .orderBy("user_id", "start_s")
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getDouble(5)))

    assert(streamed.toSeq === batch.toSeq)
  }

  test("topPaths: paths truncate at maxSteps, conversion counts the " +
      "WHOLE session, ties order by path") {
    import spark.implicits._
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val rows =
      Seq((1L, 10L, "view", ts(1)), (1L, 11L, "click", ts(2)),
        (1L, 12L, "purchase", ts(3)),
        (2L, 20L, "view", ts(1)), (2L, 21L, "click", ts(2)),
        (3L, 30L, "view", ts(1)), (3L, 31L, "click", ts(2)),
        (3L, 32L, "purchase", ts(3))) ++
      // user 4: 6 views then a purchase — path truncates to 5 views
      // but the conversion still counts
      (0 until 6).map(i => (4L, 40L + i, "view", ts(10 + i))) :+
      (4L, 46L, "purchase", ts(16))
    val df = rows.toDF("user_id", "event_id", "event_type", "ts")
    val out = Sessionize.topPaths(df, gapSeconds = 21600L,
      maxSteps = 5, topK = 10).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.head == (("view>click>purchase", 2L, 1000000L)),
      s"${out.toSeq}")
    assert(out.contains(("view>click", 1L, 0L)))
    assert(out.contains(("view>view>view>view>view", 1L, 1000000L)),
      s"truncated path must still convert: ${out.toSeq}")
  }
}
