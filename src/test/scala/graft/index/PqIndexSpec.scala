package graft.index

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions.col

import graft.{SparkSpec, Tables}
import graft.embed.DeterministicEmbedder
import graft.search.VectorSearch

class PqIndexSpec extends SparkSpec {

  private val e  = DeterministicEmbedder(64)
  private val qv = e.embed("spark join merge sort window")

  private lazy val dir = {
    val d = Files.createTempDirectory("pq").toString
    PqIndex.build(Tables.embeddings(spark, SfDir), d, m = 8, nCodes = 16)
    d
  }

  test("build lays out codes + codebooks as one versioned unit") {
    val vDir = PqIndex.currentDir(dir)
    assert(vDir.endsWith("v00000"))
    val n   = Tables.embeddings(spark, SfDir).count()
    val pqv = spark.read.parquet(s"$vDir/pq_vectors")
    assert(pqv.count() === n)
    // every vector carries exactly m codes, each within the codebook
    val codes = pqv.selectExpr("explode(codes) AS c")
    assert(pqv.selectExpr("size(codes) AS s").where("s <> 8").count() === 0)
    assert(codes.where("c < 0 OR c >= 16").count() === 0)
    // m × nCodes codebook rows, centroids of the subspace dimension
    val cb = spark.read.parquet(s"$vDir/pq_codebooks")
    assert(cb.count() === 8 * 16)
    assert(cb.selectExpr("size(centroid) AS s").where("s <> 8").count() === 0)
  }

  test("ADC with rerank over everything equals exact brute force") {
    val brute = VectorSearch.topK(Tables.embeddings(spark, SfDir),
      "vec_id", "embedding", qv, 10).collect().toSeq
    val pq = PqIndex.knn(spark, dir, qv, 10, numCandidates = 1000000)
      .collect().toSeq
    assert(pq === brute)
  }

  test("narrow ADC shortlist still ranks the true best first") {
    val exact = VectorSearch.topK(Tables.embeddings(spark, SfDir),
      "vec_id", "embedding", qv, 10).collect().map(_.getLong(0)).toSeq
    val narrow = PqIndex.knn(spark, dir, qv, 10, numCandidates = 32)
      .collect().map(_.getLong(0)).toSeq
    assert(narrow.head === exact.head)
  }

  test("incremental update: frozen-codebook encode + append, exact after rerank") {
    val d = Files.createTempDirectory("pq_upd").toString
    val embs = Tables.embeddings(spark, SfDir)
    PqIndex.build(embs.filter(col("vec_id") % 2 === 0), d, m = 8, nCodes = 16)
    PqIndex.update(embs.filter(col("vec_id") % 2 === 1), d)
    val vDir = PqIndex.currentDir(d)
    // still v00000: update extends the current version, never republishes
    assert(vDir.endsWith("v00000"))
    assert(spark.read.parquet(s"$vDir/pq_vectors").count() === embs.count())
    // full-rerank query over the updated index equals brute force over
    // the union — codes only shortlist, the rerank is exact
    val brute = VectorSearch.topK(embs, "vec_id", "embedding", qv, 10)
      .collect().toSeq
    val pq = PqIndex.knn(spark, d, qv, 10, numCandidates = 1000000)
      .collect().toSeq
    assert(pq === brute)
    // appended vectors carry well-formed codes from the FROZEN codebooks
    val bad = spark.read.parquet(s"$vDir/pq_vectors")
      .selectExpr("size(codes) AS s").where("s <> 8").count()
    assert(bad === 0)
  }

  test("rebuild publishes a new version; superseded version survives one cycle") {
    val d = Files.createTempDirectory("pq_v").toString
    val embs = Tables.embeddings(spark, SfDir).limit(50)
    PqIndex.build(embs, d, m = 8, nCodes = 4)
    assert(PqIndex.currentDir(d).endsWith("v00000"))
    PqIndex.build(embs, d, m = 8, nCodes = 4)
    // grace window: v00000 retained after the flip to v00001
    assert(PqIndex.currentDir(d).endsWith("v00001"))
    assert(Files.isDirectory(Paths.get(d, "v00000")))
    PqIndex.build(embs, d, m = 8, nCodes = 4)
    // one more cycle: v00000 vacuumed, v00001 in its grace window
    assert(PqIndex.currentDir(d).endsWith("v00002"))
    assert(!Files.isDirectory(Paths.get(d, "v00000")))
    assert(Files.isDirectory(Paths.get(d, "v00001")))
    // explicit vacuum(keep = 0) clears the grace window too
    PqIndex.vacuum(spark, d, keep = 0)
    assert(!Files.isDirectory(Paths.get(d, "v00001")))
    assert(Files.isDirectory(Paths.get(d, "v00002")))
  }

  test("delete: survivors match brute force; victims never return; files fold") {
    val d = Files.createTempDirectory("pq_del").toString
    val embs = Tables.embeddings(spark, SfDir)
    PqIndex.build(embs.filter(col("vec_id") % 2 === 0), d, m = 8, nCodes = 16)
    PqIndex.update(embs.filter(col("vec_id") % 2 === 1), d)
    val victims = embs.filter(col("vec_id") % 41 === 0)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(victims.nonEmpty)
    PqIndex.delete(spark, d, victims)
    val vDir = PqIndex.currentDir(d)
    val n = embs.count() - victims.length
    assert(spark.read.parquet(s"$vDir/pq_vectors").count() === n)
    val brute = VectorSearch.topK(
      embs.filter(!col("vec_id").isin(victims: _*)),
      "vec_id", "embedding", qv, 10).collect().toSeq
    val got = PqIndex.knn(spark, d, qv, 10, numCandidates = 1000000)
      .collect().toSeq
    assert(got === brute)
  }
}
