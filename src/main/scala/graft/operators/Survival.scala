package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Discrete-time survival analysis (Kaplan–Meier life table) for
  * time-to-event questions over an event stream — "how long from first
  * exposure to conversion, accounting for users who never converted?"
  * Right-censoring at the study end is what separates this from a
  * naive latency histogram (q151): users without the target event
  * still occupy the risk set until their observation window closes.
  *
  * Scale shape: the heavy pass reduces the stream to ONE ROW PER UNIT
  * (two min-timestamp partial aggregates + a join on the unit key),
  * then to the day-offset grid — whose cardinality is bounded by the
  * CALENDAR (observation days), not the corpus, so the ordered prefix
  * over it is metadata-scale at any data size (same argument as the
  * daily-revenue grid in q235).
  *
  * Cross-engine determinism: risk/event counts are integer-exact;
  * hazards are reported as truncated integer ppm (pure long math); the
  * KM survival product is computed as exp(Σ round(ln(1−h), 9)) with
  * the sum in DECIMAL(28,9) — associativity-free — and a single exp at
  * the end, so both engines run the identical float ops. A stratum
  * whose last risk set converts entirely (h = 1) gets survival 0 from
  * that step on (the ln pole is handled explicitly, fail-closed).
  */
object Survival {

  /** Life table at daily resolution. `df` must have one row per unit
    * with `startCol`/`eventCol` second-precision epoch timestamps
    * (eventCol null ⇒ censored) and `censorTs` the study-end cut.
    * Returns (d, n_risk, n_event, hazard_ppm, survival) for each day
    * offset d at which at least one event occurred, ordered by d. */
  def kmDaily(df: DataFrame, startCol: String, eventCol: String,
      censorTs: Column): DataFrame = {
    val day = 86400L
    val units = df.select(
      floor((coalesce(col(eventCol), censorTs) - col(startCol)) / day)
        .cast("long").as("dur"),
      col(eventCol).isNotNull.as("ev"))
    val grid = units.groupBy("dur")
      .agg(sum(when(col("ev"), 1L).otherwise(0L)).as("n_event"),
        count(lit(1)).as("n_at"))
    // risk set at d = units with dur >= d  (censored-at-d stay in the
    // risk set for d's events — the standard KM tie convention)
    val w = Window.orderBy(col("dur").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withRisk = grid
      .withColumn("n_risk", sum(col("n_at")).over(w)) // calendar-scale grid
      .filter(col("n_event") > 0)
    val h = col("n_event").cast("double") / col("n_risk").cast("double")
    val lnTerm = when(col("n_event") < col("n_risk"),
      round(log(lit(1.0) - h), 9).cast(DecimalType(28, 9)))
      .otherwise(lit(null).cast(DecimalType(28, 9)))
    val w2 = Window.orderBy("dur")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withRisk
      .withColumn("__ln", lnTerm)
      .withColumn("__dead", max(when(col("n_event") === col("n_risk"), 1L)
        .otherwise(0L)).over(w2))
      .select(col("dur").as("d"), col("n_risk"), col("n_event"),
        expr("n_event * 1000000L div n_risk").as("hazard_ppm"),
        when(col("__dead") === 1L, lit(0.0))
          .otherwise(round(exp(sum(col("__ln")).over(w2).cast("double")), 6))
          .as("survival"))
      .orderBy("d")
  }

  /** First-view→first-purchase survival frame from the events table:
    * one row per user who ever viewed, with epoch-second start and
    * (nullable) conversion timestamps. Exposed separately so the spec
    * can pin the censoring semantics on a fixture. */
  def viewToPurchase(events: DataFrame): DataFrame = {
    val sec = unix_timestamp(date_trunc("second", col("ts")))
    val ev = events.select(col("user_id"), col("event_type"), sec.as("s"))
    val views = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("s")).as("t0"))
    val buys = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id").agg(min(col("s")).as("tp_any"))
    views.join(buys, Seq("user_id"), "left")
      .select(col("user_id"), col("t0"),
        when(col("tp_any") > col("t0"), col("tp_any")).as("tp"))
  }
}
