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

  test("md5 bucket function matches the SQL form exactly") {
    // Md5HashingTF.bucket must evaluate conv(substring(md5(t),1,15),16,10)
    // % dim — the same expression TextFunctions.md5Long runs in Spark SQL
    // and the oracle runs in DuckDB. Cross-check against the SQL engine.
    val toks = Seq("spark", "join", "merge", "sort", "window", "a", "0",
      "longertokenwithmanychars", "ünïcödé")
    val viaSql = toks.toDF("t")
      .select(col("t"), pmod(graft.functions.TextFunctions.md5Long(col("t")),
        lit(64L)).as("b"))
      .as[(String, Long)].collect().toMap
    toks.foreach { t =>
      assert(Md5HashingTF.bucket(t, 64) === viaSql(t).toInt, s"token $t")
    }
  }

  test("md5 MLlib pipeline equals the oracle-checked TfIdfEmbed twin exactly") {
    // q58's correctness chain: the md5-hashed MLlib pipeline must produce
    // the SAME normalized weights as TfIdfEmbed.sparseEmbed, whose every
    // weight is oracle-checked via q57. Same tokenizer, same bucket
    // function, same idf formula, same normalization — only the execution
    // engine (MLlib stages vs DataFrame algebra) differs.
    val docs = Tables.documents(spark, SfDir).select("doc_id", "text")
    val ml = MlEmbedder.transformCorpus(docs, "text", "vec", dim = 64,
      hash = "md5", doubleOut = true)
      .select("doc_id", "vec").as[(Long, Seq[Double])].collect().toMap
    val twin = TfIdfEmbed.sparseEmbed(docs, "doc_id", "text", dim = 64)
      .select("doc_id", "bucket", "w").as[(Long, Long, Double)].collect()
      .groupBy(_._1)
    assert(ml.nonEmpty && twin.nonEmpty)
    twin.foreach { case (id, rows) =>
      val dense = new Array[Double](64)
      rows.foreach { case (_, b, w) => dense(b.toInt) = w }
      val v = ml(id)
      (0 until 64).foreach { i =>
        assert(math.abs(v(i) - dense(i)) < 1e-12,
          s"doc $id bucket $i: mllib ${v(i)} vs twin ${dense(i)}")
      }
    }
  }

  test("murmur3 and md5 spaces coincide once the hash is injective on the vocab") {
    // The production murmur3 path differs from the oracle-checked md5
    // path ONLY in the bucket hash. At dim 64 a 31-token vocabulary
    // collides differently under each hash, so neighborhoods legitimately
    // diverge; at a dim where BOTH hashes are injective on the vocab the
    // vectors are bucket-permutations of token-space TF-IDF and cosine
    // neighborhoods must agree. This pins the murmur3 pipeline's math
    // against the oracled twin with the one unverifiable ingredient
    // removed.
    val docs = Tables.documents(spark, SfDir).select("doc_id", "text")
      .as[(Long, String)].collect()
    val vocab = docs.flatMap(_._2.toLowerCase.split("[^a-z0-9]+"))
      .filter(_.nonEmpty).distinct
    val dim = 8192
    val mur = MlEmbedder.fit(docs.toSeq.toDF("doc_id", "text"), "text", dim)
    val md5 = MlEmbedder.fit(docs.toSeq.toDF("doc_id", "text"), "text", dim,
      hash = "md5")
    // precondition: both hashes injective on this corpus vocabulary
    val hasher = new org.apache.spark.ml.feature.HashingTF().setNumFeatures(dim)
    assert(vocab.map(hasher.indexOf).distinct.length === vocab.length,
      "murmur3 collides at this dim; raise it")
    assert(vocab.map(Md5HashingTF.bucket(_, dim)).distinct.length === vocab.length,
      "md5 collides at this dim; raise it")
    val murVecs = docs.map { case (id, t) => id -> mur.embedDouble(t) }.toMap
    val md5Vecs = docs.map { case (id, t) => id -> md5.embedDouble(t) }.toMap
    def top10(space: Map[Long, Array[Double]], q: Long): Seq[Long] =
      space.toSeq.map { case (id, v) =>
        id -> space(q).zip(v).map { case (a, b) => a * b }.sum
      }.sortBy { case (id, s) => (-s, id) }.take(10).map(_._1)
    val queries = docs.map(_._1).filter(_ % 20 == 0).toSeq.sorted
    assert(queries.size >= 20)
    val recalls = queries.map(q =>
      top10(murVecs, q).toSet.intersect(top10(md5Vecs, q).toSet).size / 10.0)
    val mean = recalls.sum / recalls.size
    info(f"mean recall@10 across ${queries.size} query docs: $mean%.3f")
    assert(mean >= 0.95,
      f"spaces diverged despite injective hashing — math bug: $mean%.3f")
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
