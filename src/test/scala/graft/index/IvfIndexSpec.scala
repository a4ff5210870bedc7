package graft.index

import java.nio.file.{Files, Paths}

import graft.{SparkSpec, Tables}
import graft.embed.DeterministicEmbedder
import graft.search.VectorSearch

class IvfIndexSpec extends SparkSpec {

  private lazy val dir = {
    val d = Files.createTempDirectory("ivf").toString
    IvfIndex.build(Tables.embeddings(spark, SfDir), d, nCells = 8)
    d
  }

  test("build lays out cell-partitioned vectors and a centroid table") {
    val cells = Files.list(Paths.get(dir, "ivf_vectors")).toArray
      .map(_.toString).count(_.contains("ivf_cell="))
    assert(cells === 8)
    assert(spark.read.parquet(s"$dir/centroids").count() === 8)
  }

  test("full-probe IVF knn equals brute force") {
    val e  = DeterministicEmbedder(64)
    val qv = e.embed("spark join merge sort window")
    val brute = VectorSearch.topK(Tables.embeddings(spark, SfDir),
      "vec_id", "embedding", qv, 10).collect().map(_.getLong(0)).toSeq
    val ivf = IvfIndex.knn(spark, dir, qv, 10, nProbe = 8)
      .collect().map(_.getLong(0)).toSeq
    assert(ivf === brute)
  }

  test("tight probe returns candidates from the query's own cell") {
    val e  = DeterministicEmbedder(64)
    // use an actual corpus vector as the query: must be in the probed cell
    val row = Tables.embeddings(spark, SfDir).orderBy("vec_id").head()
    val qv  = row.getSeq[Float](1).toArray
    val got = IvfIndex.knn(spark, dir, qv, 5, nProbe = 1).collect()
    assert(got.nonEmpty)
    assert(got.head.getLong(0) === row.getLong(0)) // itself, cosine 1.0
    assert(math.abs(got.head.getDouble(1) - 1.0) < 1e-5)
  }
}
