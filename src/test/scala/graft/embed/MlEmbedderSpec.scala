package graft.embed

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class MlEmbedderSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "spark shuffles data between stages when joins need alignment"),
    (2L, "spark broadcasts small tables to avoid shuffles in joins"),
    (3L, "the quick brown fox jumps over the lazy dog"),
    (4L, "completely unrelated musings about cooking pasta al dente"),
    (5L, "")
  ).toDF("doc_id", "text")

  test("corpus transform and query-side embed produce the same vector") {
    val fitted = MlEmbedder.fit(corpus, "text", dim = 64)
    val byDoc = MlEmbedder.transformCorpus(corpus, "text", "vec", dim = 64)
      .select("doc_id", "vec").as[(Long, Seq[Float])].collect().toMap
    val texts = corpus.as[(Long, String)].collect().toMap
    texts.foreach { case (id, text) =>
      val q = fitted.embed(text)
      val c = byDoc(id)
      assert(c.length === 64)
      c.zip(q).zipWithIndex.foreach { case ((a, b), i) =>
        assert(math.abs(a - b) < 1e-6, s"doc $id dim $i: corpus $a vs query $b")
      }
    }
  }

  test("fit is deterministic and vectors are L2-normalized") {
    val f1 = MlEmbedder.fit(corpus, "text", dim = 64)
    val f2 = MlEmbedder.fit(corpus, "text", dim = 64)
    assert(f1.idf.toSeq === f2.idf.toSeq)
    val v = f1.embed("spark shuffles data")
    val n = math.sqrt(v.map(x => x.toDouble * x).sum)
    assert(math.abs(n - 1.0) < 1e-5)
    assert(f1.embed("").forall(_ == 0f)) // empty text → zero vector
  }

  test("similar docs are cosine-closer than unrelated docs") {
    val fitted = MlEmbedder.fit(corpus, "text", dim = 64)
    def cos(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    val d1 = fitted.embed("spark shuffles data between stages when joins need alignment")
    val d2 = fitted.embed("spark broadcasts small tables to avoid shuffles in joins")
    val d4 = fitted.embed("completely unrelated musings about cooking pasta al dente")
    assert(cos(d1, d2) > cos(d1, d4))
  }

  test("tfidf twin: sparse weights are normalized, nnz bounded by dim") {
    val docs = Tables.documents(spark, SfDir)
    val sparse = TfIdfEmbed.sparseEmbed(docs, "doc_id", "text", dim = 64)
    val norms = sparse.groupBy("doc_id")
      .agg(sum(col("w") * col("w")).as("ss"), count(lit(1)).as("nnz"))
      .collect()
    norms.foreach { r =>
      assert(math.abs(r.getAs[Double]("ss") - 1.0) < 1e-9)
      assert(r.getAs[Long]("nnz") <= 64L)
    }
  }
}
