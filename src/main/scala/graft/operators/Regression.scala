package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Closed-form distributed OLS — the "fit a linear model over 100 TB
  * without a gradient loop" operator. The corpus pass is ONE
  * partial-aggregating scan producing the k(k+3)/2 + 2 normal-equation
  * moments (n, Σxᵢ, Σxᵢxⱼ, Σy, Σxᵢy, Σy²); the solve is a single
  * deterministic expression over that 1-row metadata frame (Cramer's
  * rule for the 3×3 system), so nothing model-sized ever iterates and
  * nothing corpus-sized is ever collected.
  *
  * Exactness discipline (the [[AbTest]] pattern): inputs are 2-dp
  * quantities, so moments accumulate in DECIMAL — Spark's partial-agg
  * order and a single-threaded engine's order produce the SAME sums.
  * The fragile float math (determinants, divisions) happens once, on
  * identical double inputs, as an identical expression tree — so an
  * oracle writing the same formula text gets bit-identical results.
  */
object Regression {

  private def d184(c: Column): Column = c.cast(DecimalType(18, 4))

  /** OLS of `y ~ 1 + x1 + x2`: one row with n, coefficients (b0, b1,
    * b2) and r2, floats rounded to 6 dp. Requires the design matrix to
    * be non-degenerate (det ≠ 0); fixture data with collinear
    * regressors would surface as a null coefficient row. */
  def ols2(df: DataFrame, yCol: String, x1Col: String, x2Col: String)
      : DataFrame = {
    val (y, x1, x2) = (d184(col(yCol)), d184(col(x1Col)), d184(col(x2Col)))
    val m = df.agg(
      count(lit(1)).cast("double").as("n"),
      sum(x1).cast("double").as("s1"),
      sum(x2).cast("double").as("s2"),
      sum(x1 * x1).cast("double").as("s11"),
      sum(x1 * x2).cast("double").as("s12"),
      sum(x2 * x2).cast("double").as("s22"),
      sum(y).cast("double").as("sy"),
      sum(x1 * y).cast("double").as("s1y"),
      sum(x2 * y).cast("double").as("s2y"),
      sum(y * y).cast("double").as("syy"))
    // Cramer's rule on [[n,s1,s2],[s1,s11,s12],[s2,s12,s22]] b = rhs.
    // The formula TEXT below is mirrored verbatim in the oracle SQL —
    // identical operation order on identical doubles is bit-identical.
    val det = col("n") * (col("s11") * col("s22") - col("s12") * col("s12")) -
      col("s1") * (col("s1") * col("s22") - col("s12") * col("s2")) +
      col("s2") * (col("s1") * col("s12") - col("s11") * col("s2"))
    val det0 = col("sy") * (col("s11") * col("s22") - col("s12") * col("s12")) -
      col("s1") * (col("s1y") * col("s22") - col("s12") * col("s2y")) +
      col("s2") * (col("s1y") * col("s12") - col("s11") * col("s2y"))
    val det1 = col("n") * (col("s1y") * col("s22") - col("s12") * col("s2y")) -
      col("sy") * (col("s1") * col("s22") - col("s12") * col("s2")) +
      col("s2") * (col("s1") * col("s2y") - col("s1y") * col("s2"))
    val det2 = col("n") * (col("s11") * col("s2y") - col("s1y") * col("s12")) -
      col("s1") * (col("s1") * col("s2y") - col("s1y") * col("s2")) +
      col("sy") * (col("s1") * col("s12") - col("s11") * col("s2"))
    val b0 = det0 / det
    val b1 = det1 / det
    val b2 = det2 / det
    // SSE = Σy² − b·(X'y); SST = Σy² − (Σy)²/n — both from moments only
    val sse = col("syy") - b0 * col("sy") - b1 * col("s1y") - b2 * col("s2y")
    val sst = col("syy") - col("sy") * col("sy") / col("n")
    m.select(
      col("n").cast("long").as("n"),
      round(b0, 6).as("b0"),
      round(b1, 6).as("b1"),
      round(b2, 6).as("b2"),
      round(lit(1.0) - sse / sst, 6).as("r2"))
  }
}
