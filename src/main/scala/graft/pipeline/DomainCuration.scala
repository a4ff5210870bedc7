package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.text.TextAnalysis

/** Domain-level curation for multi-source training corpora: quality
  * priors with small-sample shrinkage, and temperature-based mixture
  * reweighting (the multi-domain sampling recipe of GPT-3/The Pile:
  * p_i ∝ T_i^τ with τ < 1 upweighting small domains).
  *
  * Everything is two aggregation levels — per-domain partial aggs, then
  * a domains-count-sized relation (metadata scale: thousands of domains
  * at 100 TB, never row scale) broadcast back where a per-row decision
  * is needed. Sampling decisions are md5-deterministic in integer ppm
  * space (the [[Sampling.hashSample]] convention), so a re-run or a
  * different engine admits the identical document set. */
object DomainCuration {

  /** Per-domain quality prior with empirical-Bayes shrinkage toward the
    * corpus mean: shrunk_i = (Σq_i + m·ḡ) / (n_i + m). Small domains
    * pull to the global mean, large domains keep their own — the weight
    * a curation pipeline multiplies into per-doc quality so a
    * 10-document domain can't dominate by luck. */
  def domainQualityPrior(docs: DataFrame, domainCol: String,
      textCol: String, priorWeight: Double = 20.0): DataFrame = {
    val scored = docs.select(col(domainCol).as("domain"),
      TextAnalysis.qualityScore(col(textCol)).as("q"))
    val per = scored.groupBy("domain")
      .agg(count(lit(1)).as("n_docs"), sum(col("q")).as("sq"))
    val global = scored.agg(
      (sum(col("q")) / count(lit(1))).as("gmean"))
    per.crossJoin(broadcast(global))
      .select(col("domain"), col("n_docs"),
        round(col("sq") / col("n_docs"), 6).as("raw_mean"),
        round((col("sq") + lit(priorWeight) * col("gmean")) /
          (col("n_docs") + lit(priorWeight)), 6).as("shrunk_mean"))
  }

  /** Temperature-mixture sampling rates + the sampled corpus stats:
    * domain weight p_i ∝ T_i^τ (τ = 0.5 ⇒ sqrt — written as sqrt on
    * both engines for bit parity), target token budget B, per-domain
    * keep rate r_i = min(1, B·p_i / T_i) rounded to ppm, documents
    * admitted by md5 hash < r_i·1e6. Returns one row per domain:
    * (domain, n_docs, n_tokens, rate, n_kept, kept_tokens). */
  def temperatureMixture(docs: DataFrame, domainCol: String,
      idCol: String, textCol: String, budgetTokens: Long): DataFrame = {
    val base = docs.select(col(domainCol).as("domain"),
      col(idCol).as("id"),
      TextFunctions.tokenCount(col(textCol)).as("t"),
      pmod(TextFunctions.md5Long(col(idCol).cast("string")),
        lit(1000000L)).as("h"))
    val per = base.groupBy("domain")
      .agg(count(lit(1)).as("n_docs"), sum(col("t")).as("n_tokens"))
    val tot = per.agg(sum(sqrt(col("n_tokens").cast("double"))).as("ss"))
    val rates = per.crossJoin(broadcast(tot))
      .select(col("domain"), col("n_docs"), col("n_tokens"),
        round(least(lit(1.0),
          lit(budgetTokens.toDouble) *
            (sqrt(col("n_tokens").cast("double")) / col("ss")) /
            col("n_tokens").cast("double")), 6).as("rate"))
      .withColumn("ppm", round(col("rate") * 1e6).cast("long"))
    val kept = base
      .join(broadcast(rates.select("domain", "ppm")), "domain")
      .groupBy("domain")
      .agg(sum(when(col("h") < col("ppm"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("h") < col("ppm"), col("t")).otherwise(0L))
          .as("kept_tokens"))
    rates.drop("ppm").join(kept, "domain")
  }
}
