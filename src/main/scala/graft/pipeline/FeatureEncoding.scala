package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Leakage-safe categorical target encoding — the feature-engineering
  * twin of the leakage-safe split (q171) and point-in-time join (q178):
  * encoding a category by its target mean must EXCLUDE each row's own
  * fold, or the feature memorizes the label (classic target leakage).
  *
  * Out-of-fold m-estimate (Micci-Barreca 2001): for category c and
  * fold f,
  *   oof(c,f) = (sum(c) - sum(c,f) + m·prior) / (cnt(c) - cnt(c,f) + m)
  * where prior is the global target mean and m the smoothing
  * pseudo-count that shrinks rare categories toward it.
  *
  * Scale shape: one partial-aggregated groupBy(cat, fold) — the only
  * pass over the corpus — then pure metadata algebra: the per-category
  * rollup aggregates the (cat × fold)-sized frame, the 1-row global
  * prior rides a broadcast, and the result joins back to rows (when
  * materializing the feature) as a broadcast of |cats|·|folds| rows.
  * Sums accumulate as DECIMAL(18,4) so the means are exact and
  * partition-order-free (the q01 discipline) — double summation would
  * drift between engines at 100 TB row counts.
  */
object FeatureEncoding {

  /** Encoding table at (category, fold) granularity: n_in_fold plus the
    * smoothed out-of-fold mean. Rows with a NULL target are excluded
    * (they carry no label signal), matching SQL avg semantics. */
  def kFoldTargetEncode(df: DataFrame, catCol: String, targetCol: String,
      foldCol: String, smoothing: Double = 10.0): DataFrame = {
    val d = col(targetCol).cast(DecimalType(18, 4))
    val perFold = df
      .groupBy(col(catCol), col(foldCol))
      .agg(sum(d).as("fold_sum"), count(d).as("fold_cnt"))
    val perCat = perFold
      .groupBy(col(catCol))
      .agg(sum(col("fold_sum")).as("cat_sum"),
        sum(col("fold_cnt")).as("cat_cnt"))
    val prior = df.agg(
      (sum(d).cast("double") / count(d)).as("prior"))
    perFold
      .join(perCat, catCol)
      .crossJoin(broadcast(prior))
      .select(
        col(catCol), col(foldCol), col("fold_cnt").as("n_in_fold"),
        round(
          ((col("cat_sum") - col("fold_sum")).cast("double")
            + lit(smoothing) * col("prior")) /
            ((col("cat_cnt") - col("fold_cnt")).cast("double")
              + lit(smoothing)),
          6).as("oof_mean"))
  }
}
