package graft.operators

import graft.operators.Ckpt.CkptOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Heavy-tail diagnostics: the Hill estimator of the power-law tail
  * index (Hill 1975) from the top-k order statistics —
  * H = (1/k) Σ_{i=1..k} ln(x_(i) / x_(k+1)),  α̂ = 1/H.
  * α̂ ≤ 2 means infinite variance: means of such metrics don't
  * converge and the robust machinery ([[Ranks.winsorizedMean]],
  * [[Resample.jackknifeRatio]]) stops being optional. The pipeline's
  * "should I even average this column?" gate.
  *
  * Scale shape: TakeOrderedAndProject pulls exactly k+1 rows (k is a
  * knob, not corpus-sized); the ln terms round to 9 dp and sum in
  * DECIMAL. Ties at the k/(k+1) boundary are harmless: the top-(k+1)
  * VALUE MULTISET is tiebreak-independent, and the estimator only
  * reads values. */
object Tail {

  /** One row (k, x_k1, hill_h, alpha) for the top `k` of `valueCol`
    * (must be positive where it matters — rows with value ≤ 0 are
    * excluded: a power-law tail is a positive-support statement). */
  def hill(df: DataFrame, valueCol: String, k: Int): DataFrame = {
    require(k >= 2)
    val top = df.select(col(valueCol).cast("double").as("v"))
      .filter(col("v") > 0.0)
      .orderBy(col("v").desc).limit(k + 1)
      .graftCheckpoint(true) // k+1 rows; reused for threshold + terms
    val thr = broadcast(top.agg(min(col("v")).as("xk1"),
      count(lit(1)).as("m")))
    top.crossJoin(thr)
      .filter(col("v") > col("xk1")) // the k rows above the threshold
      .select(col("xk1"), col("m"),
        round(log(col("v") / col("xk1")), 9)
          .cast(DecimalType(28, 9)).as("t"))
      .groupBy("xk1", "m").agg(count(lit(1)).as("kEff"),
        sum(col("t")).cast("double").as("s"))
      .select(col("kEff").cast("long").as("k"),
        col("xk1").as("x_k1"),
        round(col("s") / col("kEff").cast("double"), 6).as("hill_h"),
        round(col("kEff").cast("double") / col("s"), 6).as("alpha"))
  }
}
