package graft.search

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.functions.VectorFunctions

class MmrSpec extends SparkSpec {
  import spark.implicits._

  private val QV = graft.SparkEntry.QueryVec

  private def shortlist(n: Int) = {
    val embs = Tables.embeddings(spark, SfDir)
    VectorSearch.topK(embs, "vec_id", "embedding", QV, n)
      .join(embs.select(col("vec_id").as("doc_id"), col("embedding")),
        "doc_id")
  }

  test("lambda=1 degenerates to relevance top-k; positions are 1..k") {
    val got = Mmr.rerank(shortlist(20), "doc_id", "vec_score", "embedding",
      k = 5, lambda = 1.0).collect()
    assert(got.map(_.getInt(0)).toSeq === (1 to 5))
    val topk = shortlist(20)
      .orderBy(col("vec_score").desc, col("doc_id").asc).limit(5)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(got.map(_.getLong(1)).toSeq === topk)
    assert(got.map(_.getLong(1)).distinct.length === 5, "picks distinct")
  }

  test("a duplicate of the best hit is deferred by diversity pressure") {
    // two identical top vectors: pure top-k ranks them 1-2; MMR must
    // push the clone behind genuinely different candidates
    val base = shortlist(10).limit(0) // schema template
    val top = shortlist(10).orderBy(col("vec_score").desc, col("doc_id"))
      .head()
    val clone = Seq((9999L, top.getDouble(1),
      top.getSeq[Float](2).toArray)).toDF("doc_id", "vec_score", "embedding")
    val cands = shortlist(10).unionByName(clone)
    val got = Mmr.rerank(cands, "doc_id", "vec_score", "embedding",
      k = 3, lambda = 0.5).collect()
    val ids = got.map(_.getLong(1)).toSeq
    assert(ids.contains(top.getLong(0)),
      "the original best hit must still be picked first")
    assert(!ids.tail.contains(9999L) || ids.head == 9999L,
      s"the clone (sim=1.0 to pick 1) must not be an early pick: $ids")
    assert(!(ids.take(2).toSet == Set(top.getLong(0), 9999L)),
      s"clone immediately after its twin defeats MMR: $ids")
    assert(base.columns.length === 3)
  }
}
