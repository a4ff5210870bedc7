package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
  * arXiv:2302.03169): score a raw pool against a small target domain by
  * the log-likelihood ratio of hashed n-gram features under two bag-of-
  * bigrams models. The models ARE two bucket-count relations (`buckets`
  * rows each — bounded by configuration, not data), so at 100 TB the
  * whole thing is: one scan of the target, one scan of the raw pool to
  * build counts (partial-agg groupBy on a bounded key space), then one
  * scoring scan of the raw pool against the BROADCAST `buckets`-row
  * log-ratio table. No join ever exceeds metadata scale.
  *
  * Determinism: bucket counts are exact integers, each bucket's
  * Laplace-smoothed log-ratio is one double expression over them, and a
  * document's weight is the 6-dp-rounded sum of its occurrences'
  * ratios — the repo-wide float parity discipline.
  */
object Dsir {

  /** Per-document importance weight of every document in the RAW pool
    * (`isTarget` false), scored against the target domain's hashed-bigram
    * distribution. Documents with fewer than 2 tokens carry no bigram
    * feature and are excluded (DSIR cannot score them).
    *
    * Returns (idCol, n_bigrams, weight) — weight is
    * sum over bigram occurrences of
    * `ln((c_target(b)+1)/(N_target+B)) - ln((c_raw(b)+1)/(N_raw+B))`.
    */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, buckets: Int): DataFrame = {
    val grams = docs
      .select(col(idCol), isTarget.as("__t"),
        explode(TextFunctions.shingles(
          TextFunctions.tokens(col(textCol)), 2)).as("__g"))
      .select(col(idCol), col("__t"),
        pmod(TextFunctions.md5Long(col("__g")), lit(buckets.toLong))
          .as("__b"))

    def sideCounts(t: Boolean) = grams.filter(col("__t") === t)
      .groupBy("__b").agg(count(lit(1)).as("__c"))

    def total(side: DataFrame, name: String) =
      side.agg(sum("__c").cast("double").as(name))

    // B-row log-ratio model: generate the full bucket domain so absent
    // buckets still carry their smoothed mass (a raw-only bucket must
    // penalize, not vanish).
    val domain = docs.sparkSession.range(buckets.toLong)
      .select(col("id").as("__b"))
    val model = domain
      .join(sideCounts(true).withColumnRenamed("__c", "__ct"), Seq("__b"), "left")
      .join(sideCounts(false).withColumnRenamed("__c", "__cr"), Seq("__b"), "left")
      .crossJoin(broadcast(total(sideCounts(true), "__nt")))
      .crossJoin(broadcast(total(sideCounts(false), "__nr")))
      .select(col("__b"),
        (log((coalesce(col("__ct"), lit(0L)).cast("double") + 1.0) /
            (col("__nt") + buckets.toDouble)) -
         log((coalesce(col("__cr"), lit(0L)).cast("double") + 1.0) /
            (col("__nr") + buckets.toDouble))).as("__lr"))

    grams.filter(!col("__t"))
      .join(broadcast(model), Seq("__b"))
      .groupBy(idCol)
      .agg(count(lit(1)).cast("long").as("n_bigrams"),
        round(sum("__lr"), 6).as("weight"))
  }
}
