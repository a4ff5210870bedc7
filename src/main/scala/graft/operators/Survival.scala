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

  /** Nelson–Aalen cumulative hazard H(d) = Σ_{d'≤d} n_event/n_risk —
    * the additive companion to [[kmDaily]]'s product-limit curve
    * (statistically better-behaved in small risk sets, and the input
    * to Cox-model diagnostics). Identical grid machinery: one
    * unit-level reduction, the calendar-bounded day grid, reverse
    * prefix for risk sets; per-day hazard terms are identical doubles
    * rounded to 9 dp and DECIMAL-summed, so the cumulative sum is
    * associativity-free. Returns (d, n_risk, n_event, cum_hazard) for
    * event days, ordered by d. */
  def nelsonAalenDaily(df: DataFrame, startCol: String, eventCol: String,
      censorTs: Column): DataFrame = {
    val day = 86400L
    val units = df.select(
      floor((coalesce(col(eventCol), censorTs) - col(startCol)) / day)
        .cast("long").as("dur"),
      col(eventCol).isNotNull.as("ev"))
    val grid = units.groupBy("dur")
      .agg(sum(when(col("ev"), 1L).otherwise(0L)).as("n_event"),
        count(lit(1)).as("n_at"))
    val w = Window.orderBy(col("dur").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withRisk = grid
      .withColumn("n_risk", sum(col("n_at")).over(w))
      .filter(col("n_event") > 0)
    val w2 = Window.orderBy("dur")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withRisk
      .withColumn("__t", round(col("n_event").cast("double")
        / col("n_risk").cast("double"), 9).cast(DecimalType(28, 9)))
      .select(col("dur").as("d"), col("n_risk"), col("n_event"),
        round(sum(col("__t")).over(w2).cast("double"), 6)
          .as("cum_hazard"))
      .orderBy("d")
  }

  /** Two-sample log-rank test (Mantel–Cox): does group membership
    * change the time-to-event distribution, with censoring handled —
    * the hypothesis test on top of [[kmDaily]]'s curves (the t-test is
    * WRONG for censored durations; this is the standard correction).
    * At each event day, observed group-1 events are compared to the
    * hypergeometric expectation given the risk sets;
    * χ² = (Σ(O₁−E₁))² / ΣV. Grid math only (calendar-bounded);
    * counts exact LONG, per-day terms identical doubles rounded to
    * 9 dp and DECIMAL-summed. `units` needs (dur, ev, grp). Returns
    * one row (n_1, n_2, o1, e1, chi2). */
  def logRank(units: DataFrame): DataFrame = {
    val g = units.groupBy("dur").agg(
      sum(when(col("grp") && col("ev"), 1L).otherwise(0L)).as("d1"),
      sum(when(!col("grp") && col("ev"), 1L).otherwise(0L)).as("d2"),
      sum(when(col("grp"), 1L).otherwise(0L)).as("a1"),
      sum(when(!col("grp"), 1L).otherwise(0L)).as("a2"))
    val w = Window.orderBy(col("dur").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val r = g
      .withColumn("r1", sum(col("a1")).over(w)) // calendar-scale grid
      .withColumn("r2", sum(col("a2")).over(w))
      .filter(col("d1") + col("d2") > 0)
    val d = (col("d1") + col("d2")).cast("double")
    val rr = (col("r1") + col("r2")).cast("double")
    val e1 = d * col("r1").cast("double") / rr
    val v = when(col("r1") + col("r2") === 1L, lit(0.0))
      .otherwise(d * (col("r1").cast("double") / rr)
        * (col("r2").cast("double") / rr) * (rr - d) / (rr - 1.0))
    val tot = broadcast(units.agg(
      sum(when(col("grp"), 1L).otherwise(0L)).as("n_1"),
      sum(when(!col("grp"), 1L).otherwise(0L)).as("n_2")))
    val d289 = DecimalType(28, 9)
    r.select(col("d1"),
        round(e1, 9).cast(d289).as("te"),
        round(col("d1").cast("double") - e1, 9).cast(d289).as("tu"),
        round(v, 9).cast(d289).as("tv"))
      .agg(sum(col("d1")).as("o1"), sum(col("te")).cast("double").as("es"),
        sum(col("tu")).cast("double").as("us"),
        sum(col("tv")).cast("double").as("vs"))
      .crossJoin(tot)
      .select(col("n_1"), col("n_2"), col("o1"),
        round(col("es"), 6).as("e1"),
        when(col("vs") === 0.0, lit(null).cast("double"))
          .otherwise(round(col("us") * col("us") / col("vs"), 6))
          .as("chi2"))
  }

  /** Restricted mean survival time RMST(τ) = ∫₀^τ S(t) dt — the
    * clinically/operationally interpretable scalar on top of
    * [[kmDaily]]'s curve ("average days survived within the first τ"),
    * robust where the median is undefined (S never crosses 0.5) and
    * the hazard ratio is unreadable. Area of the step function:
    * Σ segments' entering-survival × clamped length, plus the tail
    * segment from the last event day to τ.
    *
    * Scale shape: everything after [[kmDaily]]'s one unit-level
    * reduction is grid math on the calendar-bounded event-day relation
    * (the blessed post-aggregate grid window). Per-segment areas are
    * identical doubles (6-dp survival × integer length) rounded to
    * 6 dp and DECIMAL-summed — associativity-free on both engines.
    * Returns one row (horizon_days, n_event_days, rmst_days). */
  def rmstDaily(df: DataFrame, startCol: String, eventCol: String,
      censorTs: Column, tauDays: Long): DataFrame = {
    require(tauDays >= 1, "horizon must be >= 1 day")
    val d286 = DecimalType(28, 6)
    val km = kmDaily(df, startCol, eventCol, censorTs)
      .select(col("d"), col("survival"))
    val w = Window.orderBy("d")
    val segs = km
      .withColumn("__ps", lag(col("survival"), 1, 1.0).over(w))
      .withColumn("__pd", coalesce(lag(col("d"), 1).over(w), lit(0L)))
      .select(round(col("__ps") *
          (least(col("d"), lit(tauDays))
            - least(col("__pd"), lit(tauDays))).cast("double"), 6)
        .cast(d286).as("__a"))
      .agg(coalesce(sum(col("__a")), lit(0).cast(d286)).as("__area"),
        count(lit(1)).as("n_event_days"))
    // tail: survival after the LAST event day carries to the horizon
    val tail = km
      .agg(max(struct(col("d"), col("survival"))).as("m"))
      .select(round(coalesce(col("m.survival"), lit(1.0)) *
          (lit(tauDays) - least(coalesce(col("m.d"), lit(0L)),
            lit(tauDays))).cast("double"), 6).cast(d286).as("__t"))
    segs.crossJoin(broadcast(tail))
      .select(lit(tauDays).as("horizon_days"), col("n_event_days"),
        round((col("__area") + col("__t")).cast("double"), 6)
          .as("rmst_days"))
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
