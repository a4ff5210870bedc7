package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy audits for training-data release — the gate a corpus passes
  * before leaving the curation pipeline (the complement of the PII
  * redaction scrub, [[graft.functions.TextFunctions.redactPii]]).
  *
  * k-anonymity (Sweeney 2002): every combination of quasi-identifier
  * values must be shared by ≥ k rows, else the combination re-identifies
  * its members. l-diversity (Machanavelli et al. 2007): within each
  * quasi-identifier group the SENSITIVE attribute must take ≥ l distinct
  * values, else membership alone discloses it (the homogeneity attack
  * k-anonymity misses).
  *
  * Scale shape: ONE hash-aggregate over the quasi-identifier columns —
  * `count` partial-aggregates map-side and the exact distinct count
  * expands to (quasi, sensitive) grouping, both shuffling only the
  * group cardinality, never the corpus. No windows, no self-joins; at
  * 100 TB this is a plain two-level groupBy like any rollup.
  */
object Privacy {

  /** Per-group audit rows: one row per quasi-identifier combination
    * with its size, sensitive-value diversity, and the two violation
    * flags. `suppressThreshold` mirrors the standard release rule:
    * groups smaller than k must be suppressed or generalized before
    * publication — the flag is the work list. */
  def kAnonymityAudit(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, k: Int, l: Int): DataFrame =
    df.groupBy(quasiCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col(sensitiveCol)).as("n_sensitive"))
      .withColumn("k_anonymous", col("n_rows") >= k)
      .withColumn("l_diverse", col("n_sensitive") >= l)

  /** Corpus-level summary: the release decision in one row — the
    * k-anonymity level actually achieved (min group size), the
    * diversity floor, and how many rows sit in violating groups. A
    * second aggregate over the (tiny) audit output. */
  def kAnonymitySummary(audit: DataFrame): DataFrame =
    audit.agg(
      count(lit(1)).as("n_groups"),
      min(col("n_rows")).as("k_achieved"),
      min(col("n_sensitive")).as("l_achieved"),
      sum(when(!col("k_anonymous"), col("n_rows")).otherwise(lit(0L)))
        .as("rows_at_risk"),
      sum(when(!col("l_diverse"), col("n_rows")).otherwise(lit(0L)))
        .as("rows_homogeneous"))

  /** Laplace-mechanism noisy count release: `count + Lap(1/ε)` per
    * group — the ε-DP shape for a count query (sensitivity 1). The
    * noise draw inverts the Laplace CDF on a uniform derived from md5
    * of (group, salt): u = (h%1e6 + 0.5)/1e6, noise =
    * −(1/ε)·sign(u−½)·ln(1−2|u−½|).
    *
    * IMPORTANT CAVEAT (stated, not hidden): SEEDED noise is not
    * differential privacy — an adversary knowing the salt removes it.
    * The seeded form exists so the RELEASE PIPELINE is testable and
    * replayable (oracle-checkable, idempotent re-runs); a production
    * release swaps the uniform for a secure RNG draw — one line, same
    * plan. Scale: one groupBy; the noise is per-GROUP arithmetic on
    * the aggregate row, nothing touches the corpus twice. */
  def dpNoisyCounts(df: DataFrame, groupCol: String, epsilon: Double,
      salt: String = "dp0"): DataFrame = {
    require(epsilon > 0, s"epsilon must be positive, got $epsilon")
    val h = graft.functions.TextFunctions.md5Long(
      concat(col(groupCol).cast("string"), lit(":" + salt)))
    val u = (pmod(h, lit(1000000L)).cast("double") + lit(0.5)) / 1000000.0
    val centered = u - lit(0.5)
    val noise = -lit(1.0 / epsilon) * signum(centered) *
      log(lit(1.0) - lit(2.0) * abs(centered))
    df.groupBy(groupCol)
      .agg(count(lit(1)).as("__n"))
      .select(col(groupCol),
        round(col("__n") + noise, 6).as("noisy_count"))
  }
}
