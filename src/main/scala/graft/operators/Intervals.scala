package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval/sweep-line analytics: peak concurrency ("how many
  * sessions were open at once, and when?") — the capacity-planning
  * number behind connection pools, rate limits and executor sizing.
  *
  * The classic solution is a GLOBAL running sum over +1/−1 endpoint
  * deltas — a single-task sort at corpus scale. Here the running
  * extremum DECOMPOSES over time buckets exactly like the repo's
  * prefix sums: per-bucket delta totals give broadcast prefix
  * offsets; the global running max = max over buckets of
  * (bucket prefix + in-bucket running max) — two shuffles, no
  * corpus-wide window, and the argmax (earliest peak instant) rides
  * the same exact-integer struct ordering. */
object Intervals {

  /** Peak concurrency over (startCol, endCol) second-precision epoch
    * intervals, END-INCLUSIVE: intervals touching at one second DO
    * overlap there. Returns one row (n_intervals, peak, t_peak) —
    * t_peak the EARLIEST instant attaining the peak. */
  def peakConcurrency(df: DataFrame, startCol: String, endCol: String,
      nBuckets: Int = 1024): DataFrame = {
    val n = df.count() // metadata action; also the n_intervals output
    val pts = df
      .select(col(startCol).cast("long").as("s"),
        col(endCol).cast("long").as("e"))
      .select(explode(array(
        struct(col("s").as("t"), lit(1L).as("d")),
        struct((col("e") + 1L).as("t"), lit(-1L).as("d")))).as("p"))
      .select(col("p.t").as("t"), col("p.d").as("d"))
    val bounds = broadcast(pts.agg(min("t").as("__lo"), max("t").as("__hi")))
    val withB = pts.crossJoin(bounds)
      .withColumn("__b",
        when(col("__hi") === col("__lo"), lit(0))
          .otherwise(least(lit(nBuckets - 1),
            floor((col("t") - col("__lo")).cast("double")
              / (col("__hi") - col("__lo")).cast("double") * nBuckets)
              .cast("int"))))
      .drop("__lo", "__hi")
    val wGrid = Window.orderBy(col("__b").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefixes = withB.groupBy("__b").agg(sum("d").as("__bd"))
      .withColumn("__pre", coalesce(sum("__bd").over(wGrid), lit(0L)))
      .select(col("__b"), col("__pre"))
    // expirations (−1 at e+1) apply BEFORE new starts at the same
    // instant — otherwise the row-level running value would
    // transiently count an interval that ended at t−1 together with
    // one starting at t. The touching-overlap convention itself is
    // encoded by the e+1 placement, not the ordering.
    val wLocal = Window.partitionBy("__b")
      .orderBy(col("t").asc, col("d").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withB.join(broadcast(prefixes), "__b")
      .withColumn("__run", col("__pre") + sum("d").over(wLocal))
      .groupBy()
      .agg(max(struct(col("__run").as("r"), (-col("t")).as("nt"),
        col("t").as("tt"))).as("m"))
      .select(lit(n).as("n_intervals"), col("m.r").as("peak"),
        col("m.tt").as("t_peak"))
  }
}
