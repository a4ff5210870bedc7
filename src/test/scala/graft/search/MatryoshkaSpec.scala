package graft.search

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.SparkEntry

class MatryoshkaSpec extends SparkSpec {

  private val Dim = SparkEntry.EmbedDim
  private val QV  = SparkEntry.QueryVec

  test("shortlist = corpus degenerates to exact brute force") {
    val embs = graft.Tables.embeddings(spark, SfDir)
    val n = embs.count().toInt
    val exact = VectorSearch.topK(embs, "vec_id", "embedding", QV, 10)
      .collect().map(_.getLong(0)).toSeq
    val mrl = VectorSearch.matryoshkaTopK(embs, "vec_id", "embedding",
      QV, 10, prefixDim = 16, shortlist = n)
      .collect().map(_.getLong(0)).toSeq
    assert(mrl == exact)
  }

  test("prefixDim = full dim ranks identically regardless of shortlist") {
    val embs = graft.Tables.embeddings(spark, SfDir)
    val exact = VectorSearch.topK(embs, "vec_id", "embedding", QV, 10)
      .collect().map(_.getLong(0)).toSeq
    val mrl = VectorSearch.matryoshkaTopK(embs, "vec_id", "embedding",
      QV, 10, prefixDim = Dim, shortlist = 10)
      .collect().map(_.getLong(0)).toSeq
    assert(mrl == exact)
  }

  test("recall floor on MRL-distributed data (leading dims carry the " +
      "energy — the property Matryoshka training creates)") {
    // the sf fixture is structureless (prefix ⟂ tail — the same regime
    // RecallFloorSpec documents for PQ), so the recall property is
    // pinned on data with the MRL energy profile: dim j scaled 1/(1+j)
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val vecs = (1L to 500L).map { id =>
      id -> Array.tabulate(Dim)(j =>
        (rnd.nextGaussian() / (1.0 + j)).toFloat)
    }
    val q = Array.tabulate(Dim)(j =>
      (rnd.nextGaussian() / (1.0 + j)).toFloat)
    val embs = vecs.toDF("vec_id", "embedding")
    val exact = VectorSearch.topK(embs, "vec_id", "embedding", q, 10)
    val mrl = VectorSearch.matryoshkaTopK(embs, "vec_id", "embedding",
      q, 10, prefixDim = 16, shortlist = 50)
    val recall = VectorSearch.recallAtK(mrl, exact)
    assert(recall >= 0.9,
      s"matryoshka recall@10 $recall below floor on MRL-profiled data")
  }

  test("rerank scores are full-dimension cosine (not prefix scores)") {
    val embs = graft.Tables.embeddings(spark, SfDir)
    val full = VectorSearch.topK(embs, "vec_id", "embedding", QV, 50)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val mrl = VectorSearch.matryoshkaTopK(embs, "vec_id", "embedding",
      QV, 10, prefixDim = 16, shortlist = 100).collect()
    mrl.foreach { r =>
      full.get(r.getLong(0)).foreach { s =>
        assert(r.getDouble(1) == s,
          s"doc ${r.getLong(0)} score ${r.getDouble(1)} != full-dim $s")
      }
    }
  }

  test("two-stage plan: both stages are TakeOrdered, no global sort") {
    val embs = graft.Tables.embeddings(spark, SfDir)
    val plan = VectorSearch.matryoshkaTopK(embs, "vec_id", "embedding",
      QV, 10, 16, 100).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
    assert(!plan.contains("rangepartitioning"),
      s"unexpected global sort exchange:\n$plan")
  }
}
