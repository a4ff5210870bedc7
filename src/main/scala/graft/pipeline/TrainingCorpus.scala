package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.functions.TextFunctions
import graft.text.TextAnalysis

/** The end-to-end training-corpus build — every curation stage this
  * engine ships, composed into ONE declarative plan:
  *
  *   exact dedup → near-dup canonicalization (minhash LSH + connected
  *   components) → benchmark decontamination → quality floor →
  *   per-language token budget → mixture recipe.
  *
  * Each stage is the already-tested operator (q18/q60/q62/q15/q43/q64);
  * the value here is the COMPOSITION: Catalyst sees one tree, so column
  * pruning flows through the whole chain and nothing materializes
  * between stages (the label-propagation loop inside nearDupClusters is
  * the one checkpointed exception, by design). At 100 TB each stage's
  * scale story is unchanged — they were all built shuffle-minimal.
  */
object TrainingCorpus {

  /** Curation knobs; every decision derives from md5 (reproducible). */
  final case class Config(
      minQuality: Double,
      tokensPerLang: Long,
      mixture: Map[String, Int],
      benchmarkPhrases: Seq[String])

  /** Build the curated corpus: returns (idCol, langCol, n_tokens) rows —
    * the admitted documents. */
  def build(docs: DataFrame, idCol: String, textCol: String,
      langCol: String, cfg: Config): DataFrame = {
    // 1. exact dedup (min-id representative per content hash).
    // Deliberately NOT checkpointed despite three consumers (16
    // document scans in the composed q76 plan): runtime exchange reuse
    // already dedupes the repeated subtrees, and an A/B (round 14)
    // showed a lazy checkpoint REGRESSES 4.60 → 4.96 s best-of — the
    // LogicalRDD leaf loses size statistics, degrading downstream
    // broadcast planning (same negative result as SetSimJoin's prefix).
    val d1 = Dedup.exactDedup(docs, idCol, textCol)
    // 2. near-dup canonicalization: keep only cluster representatives
    //    (label == own id ⇒ the cluster's min id)
    val clusters = Dedup.nearDupClusters(d1, idCol,
      Dedup.minhashCandidatePairs(d1, idCol, textCol))
    val d2 = d1.join(clusters, Seq(idCol))
      .filter(col("cluster_id") === col(idCol))
      .drop("cluster_id")
    // 3. benchmark decontamination
    val d3 = Decontaminate.decontaminate(d2, idCol, textCol,
      cfg.benchmarkPhrases)
    // 4. quality floor
    val scored = d3
      .withColumn("__q", TextAnalysis.qualityScore(col(textCol)))
      .withColumn("n_tokens", TextFunctions.tokenCount(col(textCol)))
      .filter(col("__q") >= cfg.minQuality)
    // 5. per-language token budget (md5-ordered greedy admit)
    val d4 = Sampling.tokenBudget(scored, langCol, idCol, "n_tokens",
      cfg.tokensPerLang)
    // 6. mixture recipe (per-language quotas; absent languages dropped)
    Sampling.mixtureTake(d4, langCol, idCol, cfg.mixture)
      .select(col(idCol), col(langCol), col("n_tokens"))
  }
}
