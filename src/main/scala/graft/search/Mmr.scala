package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Maximal Marginal Relevance diversified reranking (Carbonell &
  * Goldstein, SIGIR'98): greedily pick k results maximizing
  * `λ·rel(d) − (1−λ)·max_{s∈picked} sim(d, s)` — relevance traded
  * against redundancy, the standard answer-diversification stage behind
  * a RAG retriever's shortlist.
  *
  * Shape: the input is a CANDIDATE SHORTLIST (an ANN/BM25 top-N — N is
  * serving configuration, never corpus scale). The shortlist is
  * gathered into ONE aggregate row and the whole greedy loop runs as a
  * native expression ([[org.apache.spark.sql.graftext.MmrSelectExpr]])
  * on the executor — one stage, no driver round-trip, no k-deep chain
  * of tiny shuffles (the declarative unrolled form measured 9 s at
  * sf0.1 purely in stage-scheduling overhead; this runs in the noise).
  *
  * Determinism: rel and pairwise cosines are 6-dp-rounded before every
  * comparison, the λ-combination is `λ·rel − (1.0−λ)·maxsim` in
  * doubles, argmax ties break by ascending id, and the selection is
  * independent of collect order — a DuckDB oracle reproduces the exact
  * pick sequence (q153).
  */
object Mmr {

  /** Rerank `candidates` (columns: idCol, relCol — relevance — and
    * vecCol: float array) down to `k` diverse picks.
    * Returns (pos, idCol, mmr) — pos is the 1-based pick order; the
    * first pick's mmr is its relevance (empty picked-set convention). */
  def rerank(candidates: DataFrame, idCol: String, relCol: String,
      vecCol: String, k: Int, lambda: Double): DataFrame = {
    require(k >= 1, "k >= 1")
    candidates
      .agg(collect_list(struct(
        col(idCol).cast("long").as("id"),
        round(col(relCol), 6).as("rel"),
        col(vecCol).as("vec"))).as("__c"))
      .select(explode(org.apache.spark.sql.graftext.MmrSelectExpr
        .mmrSelect(col("__c"), k, lambda)).as("__p"))
      .select(col("__p.pos").as("pos"), col("__p.id").as(idCol),
        col("__p.mmr").as("mmr"))
      .orderBy("pos")
  }
}
