package graft.embed

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[ColbertEncoder]] — the trained fixture's deployment face: the
  * learned geometry actually ranks (theme queries prefer their own
  * theme's text under MaxSim AND under the pooled Embedder face), the
  * integer score table is exact, and the encoder rides BatchEmbed. */
class ColbertEncoderSpec extends SparkSpec {

  private lazy val enc = ColbertEncoder.trained

  test("committed fixture loads; dims and tables are well-formed") {
    assert(enc.dim == TinyEncoderTrain.D)
    val tt = enc.tokenTable()
    assert(tt.length == TinyEncoderTrain.V && tt(0) == null)
    for (id <- 1 until tt.length) {
      val n = tt(id).map(v => v.toDouble * v).sum
      assert(math.abs(n - 1.0) < 1e-5, s"token $id not unit-norm")
    }
    val st = enc.scoreTable("broadcast shuffle partition")
    assert(st.length == TinyEncoderTrain.V && st(1).length == 3)
    // |q̂·d̂| ≤ 1 ⇒ every integer score within ±1e6
    assert(st.flatten.forall(v => math.abs(v) <= 1000000L))
  }

  test("learned geometry ranks: each theme's own text MaxSim-beats " +
      "every other theme's, for all 8 themes") {
    val themes = TinyEncoderTrain.Themes.map(_.mkString(" "))
    def maxsimScore(query: String, doc: String): Double = {
      val qs = enc.contextualStates(query)
      val ds = enc.tokenIds(doc).map(id => enc.tokenTable()(id))
      qs.map(q => ds.map(d =>
        q.zip(d).map { case (a, b) => a.toDouble * b }.sum).max).sum /
        qs.length
    }
    for (t <- themes.indices) {
      val query = TinyEncoderTrain.Themes(t).take(4).mkString(" ")
      val own = maxsimScore(query, themes(t))
      for (u <- themes.indices if u != t)
        assert(own > maxsimScore(query, themes(u)),
          s"theme $t query did not beat theme $u")
    }
  }

  test("pooled Embedder face: unit-norm, deterministic, same-theme " +
      "cosine beats cross-theme; rides BatchEmbed over documents") {
    val a = enc.embed("coral reef tide")
    assert(a.toSeq == enc.embed("coral reef tide").toSeq)
    assert(math.abs(a.map(v => v.toDouble * v).sum - 1.0) < 1e-5)
    def cos(x: Array[Float], y: Array[Float]): Double =
      x.zip(y).map { case (p, q) => p.toDouble * q }.sum
    val same = enc.embed("whale shark kelp wave")
    val diff = enc.embed("statute appeal clause verdict")
    assert(cos(a, same) > cos(a, diff))
    assert(enc.embed("").forall(_ == 0.0f))
    val docs = graft.Tables.documents(spark, SfDir)
      .select(col("doc_id"), col("text")).limit(12)
    val rows = BatchEmbed.withEmbedding(docs, "text", "emb", enc).collect()
    assert(rows.length == 12 &&
      rows.forall(_.getSeq[Float](2).length == enc.dim))
  }

  test("bagCosinePairs: duplicate text scores exactly 1.0, same-theme " +
      "beats cross-theme, and sub-threshold pairs drop") {
    import spark.implicits._
    val docs = Seq(
      (1L, "whale coral tide reef shark"),
      (2L, "whale coral tide reef shark"),    // exact dup of 1
      (3L, "coral reef shark wave kelp"),     // same theme
      (4L, "statute appeal clause verdict plaintiff") // other theme
    ).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("a", "b")
    val got = enc.bagCosinePairs(docs, "doc_id", "text", pairs, -1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(got((1L, 2L)) == 1.0, s"exact dup: ${got((1L, 2L))}")
    assert(got((1L, 3L)) > got((1L, 4L)),
      s"theme order: ${got((1L, 3L))} vs ${got((1L, 4L))}")
    val gated = enc.bagCosinePairs(docs, "doc_id", "text", pairs,
      minCos = got((1L, 3L)) - 1e-9).collect()
    assert(gated.length == 2) // the dup and the same-theme pair survive
  }

  test("q351's integer discipline: Spark-side join+max+sum over the " +
      "score table reproduces a driver-side MaxSim replay exactly") {
    val st = enc.scoreTable(graft.SparkEntry.ColbertQuery)
    val docs = graft.Tables.documents(spark, SfDir)
      .select(col("doc_id"), col("text")).limit(50).collect()
    val expect = docs.map { r =>
      val ids = enc.tokenIds(r.getString(1))
      val lq = st(1).length
      val score =
        if (ids.isEmpty) None
        else Some((0 until lq).map(j => ids.map(id => st(id)(j)).max).sum)
      r.getLong(0) -> score
    }.collect { case (id, Some(s)) => id -> s }.toMap
    val got = graft.SparkEntry.queries("q351_colbert_retrieval")(
      spark, SfDir).collect()
      .map(r => r.getLong(0) -> math.round(r.getDouble(1) * 1e6)).toMap
    // the query is top-10 over ALL docs; every returned doc we replayed
    // must match the replay exactly
    got.foreach { case (id, s) =>
      expect.get(id).foreach(e => assert(e == s, s"doc $id: $e vs $s"))
    }
    assert(got.size == 10)
  }
}
