package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Split-conformal prediction thresholds (Vovk et al.; Lei et al.
  * 2018): given a calibration relation of nonconformity scores
  * (|residual| of any point predictor), the per-group threshold
  * q̂ = the ⌈(n+1)(1−α)⌉-th smallest score gives prediction intervals
  * with finite-sample ≥(1−α) marginal coverage — the
  * distribution-free uncertainty wrapper for any model.
  *
  * Scale shape: the selection runs on the (group, score)-GRID with
  * bucketed prefix cumulatives — the same no-global-sort machinery as
  * [[Ranks.quantileDisc]]; no per-group corpus-sized window, no
  * driver-side sort. Rank arithmetic is exact LONG math; the one
  * float op (the ⌈(n+1)(1−α)⌉ target) is a single identical
  * expression in both engines.
  */
object Conformal {

  /** Per-group conformal threshold at miscoverage `alpha`. `df` holds
    * one calibration row per unit with a numeric `scoreCol`
    * (nonconformity, larger = worse fit). Returns
    * (groupCol, n_cal, qhat); qhat is null when ⌈(n+1)(1−α)⌉ > n
    * (the finite-sample guarantee then needs an infinite interval —
    * reported honestly rather than clamped to the max score). */
  def thresholds(df: DataFrame, groupCol: String, scoreCol: String,
      alpha: Double, nBuckets: Int = 1024): DataFrame = {
    require(alpha > 0.0 && alpha < 1.0)
    val perValue = df
      .select(col(groupCol).cast("string").as("g"),
        col(scoreCol).cast("double").as("v"))
      .groupBy("g", "v").agg(count(lit(1)).as("n_v"))
    val bounds = perValue.groupBy("g")
      .agg(min("v").as("__lo"), max("v").as("__hi"), sum("n_v").as("n_g"))
    val withB = perValue.join(broadcast(bounds), "g")
      .withColumn("__b",
        when(col("__hi") === col("__lo"), lit(0))
          .otherwise(least(lit(nBuckets - 1),
            floor((col("v") - col("__lo"))
              / (col("__hi") - col("__lo")) * nBuckets).cast("int"))))
      .drop("__lo", "__hi")
    val wGrid = Window.partitionBy("g").orderBy(col("__b").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefixes = withB.groupBy("g", "__b").agg(sum("n_v").as("__bn"))
      .withColumn("__pre", coalesce(sum("__bn").over(wGrid), lit(0L)))
      .select(col("g"), col("__b"), col("__pre"))
    val wLocal = Window.partitionBy("g", "__b").orderBy(col("v").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = withB.join(broadcast(prefixes), Seq("g", "__b"))
      .withColumn("below",
        col("__pre") + coalesce(sum("n_v").over(wLocal), lit(0L)))
    val tgt = ceil((col("n_g").cast("double") + 1.0) * (1.0 - alpha))
      .cast("long")
    val hit = cum.withColumn("__tgt", tgt)
      .filter(col("__tgt") > col("below")
        && col("__tgt") <= col("below") + col("n_v"))
      .select(col("g"), col("n_g"), col("v").as("qhat"))
    // groups whose target exceeds n_cal: emit the honest null row
    broadcast(bounds.select(col("g"), col("n_g")))
      .join(hit.drop("n_g"), Seq("g"), "left")
      .select(col("g").as(groupCol), col("n_g").as("n_cal"), col("qhat"))
  }
}
