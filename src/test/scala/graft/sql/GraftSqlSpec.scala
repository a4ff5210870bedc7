package graft.sql

import org.apache.spark.sql.graftext.GraftFunctions

import graft.{SparkSpec, Tables}
import graft.embed.DeterministicEmbedder

class GraftSqlSpec extends SparkSpec {

  private lazy val ready: Unit = {
    GraftFunctions.register(spark)
    Tables.documents(spark, SfDir).createOrReplaceTempView("documents")
    Tables.embeddings(spark, SfDir).createOrReplaceTempView("embeddings")
  }

  test("graft functions callable from SQL (extension surface)") {
    ready
    val r = spark.sql(
      """SELECT doc_id, graft_quality(text) AS q, graft_lang_id(text) AS l,
        |  graft_fingerprint(text) AS fp, size(graft_tokens(text)) AS n
        |FROM documents ORDER BY doc_id LIMIT 5""".stripMargin).collect()
    assert(r.length === 5)
    assert(r.forall(x => x.getDouble(1) >= 0 && x.getDouble(1) <= 1))
    assert(r.forall(_.getAs[Int]("n") > 0))
  }

  test("wrong arity / non-literal knob → AnalysisException naming the signature") {
    ready
    // the registry may wrap the builder's AnalysisException — assert on
    // the full cause chain's message
    def fullMsg(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(_.getMessage).mkString(" | ")
    val e1 = intercept[Exception] {
      spark.sql("SELECT graft_cosine(embedding) FROM embeddings").collect()
    }
    assert(fullMsg(e1).contains("graft_cosine expects 2"))
    val e2 = intercept[Exception] {
      // nBits is a plan-time knob: a column there must be a clear error
      spark.sql(
        "SELECT graft_shingles(graft_tokens(text), doc_id) FROM documents")
        .collect()
    }
    assert(fullMsg(e2).contains("integer literal"))
  }

  test("graft_shingles n=1 maps null tokens to empty string (concat_ws parity)") {
    ready
    val r = spark.sql(
      "SELECT graft_shingles(array('a', CAST(NULL AS STRING), 'b'), 1) AS s")
      .collect().head.getAs[scala.collection.Seq[String]]("s")
    assert(r === Seq("a", "", "b"))
  }

  test("aggregates from SQL: kmv estimate and bounded collects") {
    ready
    val kmv = spark.sql(
      """SELECT lang, graft_kmv_distinct(CAST(doc_id AS STRING), 64) AS est
        |FROM documents GROUP BY lang""".stripMargin).collect()
    assert(kmv.nonEmpty)
    assert(kmv.forall(_.getDouble(1) > 0))
    val bc = spark.sql(
      """SELECT lang, graft_bounded_collect_set(doc_id, 3) AS ids,
        |  graft_bounded_collect_list(doc_id, 100000) AS all_ids
        |FROM documents GROUP BY lang""".stripMargin).collect()
    // every lang has >3 docs → capped set is NULL, roomy list is not
    assert(bc.forall(_.isNullAt(1)))
    assert(bc.forall(r => !r.isNullAt(2) &&
      r.getSeq[Long](2).nonEmpty))
  }

  test("graft_chunk_tokens from SQL matches the Column path") {
    ready
    val viaSql = spark.sql(
      """SELECT graft_chunk_tokens(graft_tokens('a b c d e f g'), 4, 1)"""
    ).head().getSeq[String](0).toSeq
    assert(viaSql === Seq("a b c d", "d e f g", "g"))
    val e = intercept[Exception](
      spark.sql("SELECT graft_chunk_tokens(graft_tokens('a'), 4)").collect())
    assert(e.getMessage.contains("graft_chunk_tokens"))
  }

  test("graft_topk_freq from SQL matches the DataFrame path") {
    ready
    val viaSql = spark.sql(
      """SELECT lang, inline(graft_topk_freq(source, 32, 3))
        |FROM documents GROUP BY lang""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val viaDf = graft.functions.Sketches.topKFrequent(
      Tables.documents(spark, SfDir), "lang", "source", 32, 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(viaSql === viaDf)
  }

  test("graft_topk_by_score from SQL matches a sort-and-limit") {
    ready
    val viaSql = spark.sql(
      """SELECT lang, inline(graft_topk_by_score(n_chars::DOUBLE, doc_id, 3))
        |FROM documents GROUP BY lang""".stripMargin)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val viaSort = spark.sql(
      """SELECT lang, score, doc_id FROM (
        |  SELECT lang, n_chars::DOUBLE AS score, doc_id,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY n_chars DESC, doc_id) AS rk
        |  FROM documents) WHERE rk <= 3""".stripMargin)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(viaSql === viaSort && viaSql.nonEmpty)
  }

  test("graft_topk_by_score keeps duplicate (score, id) pairs — true LIMIT k multiset") {
    ready
    // a set buffer would dedupe the repeated (10.0, 1) and backfill with
    // (7.0, 4); ORDER BY score DESC, id LIMIT 4 keeps both copies
    val rows = spark.sql(
      """SELECT inline(graft_topk_by_score(score, id, 4)) FROM VALUES
        |  (10.0D, 1L), (10.0D, 1L), (9.0D, 2L), (8.0D, 3L), (7.0D, 4L)
        |  AS t(score, id)""".stripMargin)
      .collect().map(r => (r.getDouble(0), r.getLong(1))).toSeq
    assert(rows === Seq((10.0, 1L), (10.0, 1L), (9.0, 2L), (8.0, 3L)))
  }

  test("graft_simhash / graft_shingles / graft_pairs_asc from SQL") {
    ready
    val r = spark.sql(
      """SELECT doc_id,
        |  graft_simhash(transform(graft_tokens(text), t -> graft_md5long(t)), 60) AS sh,
        |  size(graft_shingles(graft_tokens(text), 3)) AS n_sh
        |FROM documents ORDER BY doc_id LIMIT 5""".stripMargin).collect()
    assert(r.length === 5)
    assert(r.forall(_.getAs[Int]("n_sh") > 0))
    val viaDf = graft.dedup.Dedup.simhash(
      Tables.documents(spark, SfDir), "doc_id", "text")
      .orderBy("doc_id").limit(5).collect().map(_.getLong(1)).toSeq
    assert(r.map(_.getLong(1)).toSeq === viaDf)

    val pairs = spark.sql(
      "SELECT graft_pairs_asc(array('a','b','c')) AS p").collect()(0)
      .getSeq[org.apache.spark.sql.Row](0)
      .map(x => (x.getString(0), x.getString(1)))
    assert(pairs === Seq(("a", "b"), ("a", "c"), ("b", "c")))
  }

  test("graft_cosine in a SQL top-k matches the DataFrame path") {
    ready
    val e  = DeterministicEmbedder(64)
    val qv = e.embed("spark join merge sort window")
    val lit = qv.map(v => s"CAST($v AS FLOAT)").mkString("array(", ", ", ")")
    val viaSql = spark.sql(
      s"""SELECT vec_id, round(graft_cosine(embedding, $lit), 6) AS s
         |FROM embeddings ORDER BY s DESC, vec_id LIMIT 5""".stripMargin)
      .collect().map(_.getLong(0)).toSeq
    val viaDf = graft.search.VectorSearch.topK(
      Tables.embeddings(spark, SfDir), "vec_id", "embedding", qv, 5)
      .collect().map(_.getLong(0)).toSeq
    assert(viaSql === viaDf)
  }

  test("graft_lsh_bucket agrees with the driver-side signature") {
    ready
    val rows = spark.sql(
      """SELECT vec_id, graft_lsh_bucket(embedding, 64, 8) AS b
        |FROM embeddings ORDER BY vec_id LIMIT 20""".stripMargin).collect()
    val embs = Tables.embeddings(spark, SfDir).orderBy("vec_id").limit(20)
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Float](1).toArray).toMap
    rows.foreach { r =>
      assert(r.getLong(1) ===
        graft.search.VectorSearch.querySignature(embs(r.getLong(0)), 64, 8))
    }
  }

  test("graft_quantile_sketch from SQL: exact percentile under capacity") {
    ready
    val got = spark.sql(
      """SELECT lang,
        |  graft_quantile_sketch(CAST(n_chars AS DOUBLE), 4096, 0.5) AS med
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = spark.sql(
      """SELECT lang, percentile(CAST(n_chars AS DOUBLE), 0.5D) AS med
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got === exact)
  }
}
