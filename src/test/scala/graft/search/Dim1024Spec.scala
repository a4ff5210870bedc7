package graft.search

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{Hyperplanes, VectorFunctions}

/** The reference's vector contract is DIM 1024 (`elasticsearch_index
  * .py:41-42,263-265`); fixtures are dim 64. This spec runs every
  * dim-parameterized vector path at the contract width over the q357
  * lattice table, so any 64-specific assumption (codebook length, LSH
  * hyperplane count, PQ subvector split, signature packing) fails HERE
  * rather than on a customer's 1024-dim corpus. The oracled end-to-end
  * leg is q357 (CORRECTNESS row); this spec covers the paths whose
  * semantics aren't SQL-expressible (LSH probe recall, PQ index build/
  * probe, binary signatures at 32 words). */
class Dim1024Spec extends SparkSpec {
  import spark.implicits._

  private val D = graft.SparkEntry.Dim1024
  private val qv = graft.SparkEntry.Dim1024QueryVec

  /** q357's generation law: exact in float and double. */
  private def gen(n: Int) =
    spark.range(n.toLong).select(col("id").as("vec_id"))
      .withColumn("embedding",
        transform(sequence(lit(1), lit(D)),
          i => (((col("vec_id") * 31 + i.cast("long") * 17) % 97)
            .cast("double") - lit(48.0)) / lit(16.0))
          .cast("array<float>"))

  test("dim guard, exact top-k and SQ8 quantized top-k agree at 1024 " +
      "(50-candidate shortlist recovers the exact top-10)") {
    val embs = gen(120).filter(VectorFunctions.hasDim(col("embedding"), D))
    assert(embs.count() === 120)
    val exact = VectorSearch.topK(embs, "vec_id", "embedding", qv, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(exact.size === 10)
    val sq8 = VectorSearch.quantizedTopK(embs, "vec_id", "embedding", qv,
      10, D, numCandidates = 50)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // int8 over the lattice loses no ordering at this shortlist size
    assert(sq8 === exact)
  }

  test("LSH hyperplanes generate at dim 1024 and the probe path " +
      "returns well-formed high-recall results") {
    val planes = Hyperplanes.planes(D, 8, seed = 42L)
    assert(planes.length === 8 && planes.forall(_.length === D))
    val embs = gen(120)
    val exact = VectorSearch.topK(embs, "vec_id", "embedding", qv, 10)
      .collect().map(_.getLong(0)).toSet
    // radius = nBits degenerates to exact — the recall ceiling holds
    val full = VectorSearch.annTopK(embs, "vec_id", "embedding", qv, 10,
      D, nBits = 8, probeHammingRadius = 8)
      .collect().map(_.getLong(0)).toSet
    assert(full === exact)
    // a real pruned probe stays well-formed (recall is data-dependent;
    // the knob spec owns recall floors at the fixture dim)
    val pruned = VectorSearch.annTopK(embs, "vec_id", "embedding", qv,
      10, D, nBits = 8, probeHammingRadius = 1)
    assert(pruned.columns.toSeq === Seq("doc_id", "vec_score"))
    assert(pruned.count() <= 10)
  }

  test("binary (1-bit) signatures pack 1024 dims into 32 words and " +
      "rerank recovers the exact top-k") {
    val embs = gen(120)
    val out = VectorSearch.binaryQuantizedTopK(embs, "vec_id",
      "embedding", qv, 5, D, numCandidates = 60)
    val exact = VectorSearch.topK(embs, "vec_id", "embedding", qv, 5)
      .collect().map(_.getLong(0)).toSet
    val got = out.collect().map(_.getLong(0)).toSet
    assert(got.size === 5)
    // asymmetric 1-bit scan + 60-candidate rerank over 120 lattice
    // rows: the exact set must survive the shortlist
    assert((got intersect exact).size >= 4)
  }

  test("PQ and IVF-PQ build/probe at 1024 (subvector split 8 x 128) " +
      "and the ADC shortlist recovers the exact top-1") {
    val embs = gen(64)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_pq1024_").toString
    graft.index.PqIndex.build(embs, s"$dir/pq", m = 8, nCodes = 8)
    val pq = graft.index.PqIndex.knn(spark, s"$dir/pq", qv, 5,
      numCandidates = 40)
    assert(pq.count() === 5)
    graft.index.IvfPqIndex.build(embs, s"$dir/ivfpq", nCells = 4,
      m = 8, nCodes = 8)
    val ivf = graft.index.IvfPqIndex.knn(spark, s"$dir/ivfpq", qv, 5,
      nProbe = 4, numCandidates = 40)
    assert(ivf.count() === 5)
    // full-probe IVF-PQ and flat PQ see the same candidates under the
    // same codebook training data; both must contain the exact top-1
    val top1 = VectorSearch.topK(embs, "vec_id", "embedding", qv, 1)
      .head().getLong(0)
    assert(pq.collect().map(_.getLong(0)).contains(top1))
    assert(ivf.collect().map(_.getLong(0)).contains(top1))
    // a wrong-width query must be REJECTED, not silently truncated
    val bad = intercept[IllegalArgumentException] {
      graft.index.PqIndex.knn(spark, s"$dir/pq",
        java.util.Arrays.copyOf(qv, 64), 5)
    }
    assert(bad.getMessage.contains("dim"))
  }
}
