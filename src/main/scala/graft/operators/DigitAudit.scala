package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benford first-digit audit — the forensic screen for fabricated or
  * truncated numeric feeds (invoice amounts, reported metrics): real
  * multiplicative-process data leads with digit d at rate
  * log₁₀(1 + 1/d); synthetic or clipped feeds don't.
  *
  * Exactness discipline: the leading digit comes from the DECIMAL
  * string form (never log₁₀, whose floor misclassifies exact powers of
  * ten at double precision); observed rates are integer ppm; expected
  * rates are PRE-COMPUTED ppm literals (so both engines compare against
  * identical constants rather than each computing its own log). */
object DigitAudit {

  /** Expected Benford ppm for digits 1-9 — computed once here and
    * inlined into oracles as literals. */
  val BenfordPpm: Seq[(Int, Long)] = (1 to 9).map(d =>
    d -> math.floor(math.log10(1.0 + 1.0 / d) * 1e6).toLong)

  /** Per-digit observed vs expected: (digit, n_obs, obs_ppm, exp_ppm)
    * over strictly positive values. One groupBy on a 9-value key —
    * partial aggregation makes the shuffle 9 rows per task. */
  def benford(df: DataFrame, valueCol: String): DataFrame = {
    val pos = df.filter(col(valueCol) >= 1) // leading digit of <1 is scale-dependent
      .select(substring(
        col(valueCol).cast(org.apache.spark.sql.types.DecimalType(18, 4))
          .cast("string"), 1, 1).cast("int").as("digit"))
    val expected = BenfordPpm.map { case (d, p) =>
      struct(lit(d).as("digit"), lit(p).as("exp_ppm"))
    }
    val exp = pos.sparkSession.range(1)
      .select(explode(array(expected: _*)).as("e"))
      .select(col("e.digit").as("digit"), col("e.exp_ppm").as("exp_ppm"))
    val counts = pos.groupBy("digit").agg(count(lit(1)).as("n_obs"))
    val total = counts.agg(sum("n_obs").as("__n"))
    counts.join(broadcast(total))
      .withColumn("obs_ppm", expr("(n_obs * 1000000) div __n"))
      .drop("__n")
      .join(broadcast(exp), Seq("digit"), "left")
      .select("digit", "n_obs", "obs_ppm", "exp_ppm")
  }
}
