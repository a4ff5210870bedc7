package graft.search

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.embed.DeterministicEmbedder

class SearchSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "spark spark spark join window"),
    (2L, "spark join"),
    (3L, "window sort merge"),
    (4L, "nothing relevant whatsoever"),
    (5L, "spark")
  ).toDF("doc_id", "text")

  test("bm25: docs with more query-term mass rank higher; irrelevant docs absent") {
    val scored = TextSearch.bm25(docs, "doc_id", "text", "spark join")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(!scored.contains(4L))
    assert(scored(1L) > scored(5L)) // doc 1 has join too
    assert(!scored.contains(3L))    // matches no query term
  }

  test("bm25 idf: rarer terms contribute more") {
    val d = Seq((1L, "common rare"), (2L, "common"), (3L, "common"),
      (4L, "common")).toDF("doc_id", "text")
    val s = TextSearch.bm25(d, "doc_id", "text", "common rare")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(s(1L) > 2 * s(2L))
  }

  test("tokenOverlapScore: fraction of query terms present") {
    val r = docs.select(col("doc_id"),
      TextSearch.tokenOverlapScore(col("text"), "spark join xyz").as("s"))
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(math.abs(r(2L) - 2.0 / 3.0) < 1e-9)
    assert(r(4L) === 0.0)
  }

  test("exactMatch caps results (reference 10000-hit cap)") {
    val d = (1 to 50).map(i => (i.toLong, "k")).toDF("doc_id", "key")
    assert(TextSearch.exactMatch(d, "key", "k", cap = 7).count() === 7L)
    assert(TextSearch.exactMatch(d, "key", "nope").count() === 0L)
  }

  test("vector topK: exact brute force returns k best by cosine") {
    val e = DeterministicEmbedder(64)
    val q = e.embed("spark join merge")
    val vecs = Seq(
      (1L, e.embed("spark join merge").toSeq),
      (2L, e.embed("spark join other").toSeq),
      (3L, e.embed("unrelated stuff entirely").toSeq),
      (4L, Seq.fill(64)(0f))
    ).toDF("vec_id", "embedding")
    val top = VectorSearch.topK(vecs, "vec_id", "embedding", q, 2).collect()
    assert(top.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    assert(math.abs(top.head.getDouble(1) - 1.0) < 1e-5)
  }

  test("ann topK: subset of brute-force results, query's own bucket probed") {
    val e = DeterministicEmbedder(64)
    val q = e.embed("spark join merge")
    val vecs = (1 to 100).map(i =>
      (i.toLong, e.embed(s"doc number $i about topic ${i % 7}").toSeq)) :+
      (999L, e.embed("spark join merge").toSeq)
    val df = vecs.toDF("vec_id", "embedding")
    val ann = VectorSearch.annTopK(df, "vec_id", "embedding", q, 5, 64,
      nBits = 8, probeHammingRadius = 8) // radius=nBits ⇒ exact
    val exact = VectorSearch.topK(df, "vec_id", "embedding", q, 5)
    assert(ann.collect().map(_.getLong(0)).toSeq ===
      exact.collect().map(_.getLong(0)).toSeq)
    // tight radius still finds the identical vector (same bucket as query)
    val tight = VectorSearch.annTopK(df, "vec_id", "embedding", q, 5, 64,
      nBits = 8, probeHammingRadius = 0)
    assert(tight.collect().map(_.getLong(0)).contains(999L))
  }

  test("phraseMatch: consecutive positions only; repeated terms exact; counts occurrences") {
    val d = Seq(
      (1L, "x alpha beta y"),          // match
      (2L, "alpha x beta"),            // terms present, not adjacent
      (3L, "alpha beta z alpha beta"), // two occurrences
      (4L, "beta alpha"),              // wrong order
      (5L, "nothing here")
    ).toDF("doc_id", "text")
    val m = TextSearch.phraseMatch(d, "doc_id", "text", "alpha beta")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m === Map(1L -> 1L, 3L -> 2L))
    // repeated phrase term: "go go" must not match "go x go"
    val rep = Seq((1L, "go go now"), (2L, "go x go"), (3L, "go go go"))
      .toDF("doc_id", "text")
    val mr = TextSearch.phraseMatch(rep, "doc_id", "text", "go go")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(mr === Map(1L -> 1L, 3L -> 2L)) // "go go go" has starts 0 and 1
  }

  test("proximityMatch: slop-bounded co-occurrence, anchors counted once") {
    val d = Seq(
      (1L, "table x y merge"),          // distance 3 — in slop
      (2L, "table a b c d merge"),      // distance 5 — out of slop 3
      (3L, "merge near table here"),    // order-free: distance 2
      (4L, "table only"),               // missing term
      (5L, "table merge table zz merge") // two anchors, both matched
    ).toDF("doc_id", "text")
    val m = TextSearch.proximityMatch(d, "doc_id", "text", "table merge", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m === Map(1L -> 1L, 3L -> 1L, 5L -> 2L))
  }

  test("quantized topK: codebook quantization recovers brute-force top-k") {
    val e = DeterministicEmbedder(64)
    val q = e.embed("spark join merge")
    val vecs = ((1 to 100).map(i =>
      (i.toLong, e.embed(s"doc number $i about topic ${i % 7}").toSeq)) :+
      (999L, e.embed("spark join merge").toSeq) :+
      (998L, Seq.fill(64)(0f))) // zero vector: degenerate-dim + zero-norm path
      .toDF("vec_id", "embedding")
    // numCandidates = corpus size ⇒ rerank over everything ⇒ exact
    val all = VectorSearch.quantizedTopK(vecs, "vec_id", "embedding",
      q, 5, 64, numCandidates = 200)
    val exact = VectorSearch.topK(vecs, "vec_id", "embedding", q, 5)
    assert(all.collect().map(_.getLong(0)).toSeq ===
      exact.collect().map(_.getLong(0)).toSeq)
    // narrow candidate set still recovers the identical vector at rank 1
    val narrow = VectorSearch.quantizedTopK(vecs, "vec_id", "embedding",
      q, 5, 64, numCandidates = 20).collect()
    assert(narrow.head.getLong(0) === 999L)
    assert(math.abs(narrow.head.getDouble(1) - 1.0) < 1e-5)
  }

  test("binaryQuantizedTopK: hand-checked sign bits; full shortlist recovers brute force") {
    val e = DeterministicEmbedder(64)
    val q = e.embed("spark join merge")
    val vecs = ((1 to 100).map(i =>
      (i.toLong, e.embed(s"doc number $i about topic ${i % 7}").toSeq)) :+
      (999L, e.embed("spark join merge").toSeq))
      .toDF("vec_id", "embedding")
    // signature hand-check: means + packing reproduced in plain Scala
    val means = VectorSearch.meanStats(vecs, "embedding", 64)
    val rows = vecs.select(col("vec_id"),
        VectorSearch.binarySignature(col("embedding"), means, 0).as("b0"),
        VectorSearch.binarySignature(col("embedding"), means, 1).as("b1"),
        col("embedding"))
      .collect()
    rows.foreach { r =>
      val v = r.getSeq[Float](3)
      def expectWord(lo: Int): Long = (lo to lo + 31).foldLeft(0L) {
        (acc, j) =>
          if (v(j).toDouble > means(j)) acc | (1L << (j - lo)) else acc
      }
      assert(r.getLong(1) === expectWord(0), s"b0 of ${r.getLong(0)}")
      assert(r.getLong(2) === expectWord(32), s"b1 of ${r.getLong(0)}")
    }
    // numCandidates = corpus size ⇒ rerank over everything ⇒ exact
    val all = VectorSearch.binaryQuantizedTopK(vecs, "vec_id", "embedding",
      q, 5, 64, numCandidates = 200)
    val exact = VectorSearch.topK(vecs, "vec_id", "embedding", q, 5)
    assert(all.collect().map(_.getLong(0)).toSeq ===
      exact.collect().map(_.getLong(0)).toSeq)
    // the identical vector's signature attains the maximum possible
    // asymmetric score Σ|q_j − mean_j| — it survives ANY shortlist and
    // reranks to the top with cosine 1
    val narrow = VectorSearch.binaryQuantizedTopK(vecs, "vec_id",
      "embedding", q, 5, 64, numCandidates = 10).collect()
    assert(narrow.head.getLong(0) === 999L)
    assert(math.abs(narrow.head.getDouble(1) - 1.0) < 1e-5)
  }

  test("maxSimTopK: group scored by its best member vector") {
    val e = DeterministicEmbedder(64)
    val q = e.embed("spark join merge")
    // group 1 has one great vector among noise; group 2 only mediocre
    val vecs = Seq(
      (1, e.embed("spark join merge").toSeq),
      (1, e.embed("noise noise noise").toSeq),
      (2, e.embed("spark join other").toSeq),
      (3, e.embed("unrelated entirely").toSeq)
    ).toDF("label", "embedding")
    val top = VectorSearch.maxSimTopK(vecs, "label", "embedding", q, 2)
      .collect().map(r => r.getInt(0) -> r.getDouble(1))
    assert(top.head._1 === 1)
    assert(math.abs(top.head._2 - 1.0) < 1e-5) // best member, not average
    assert(top(1)._1 === 2)
  }

  test("recallAtK: exact self-recall 1.0; ANN knobs trade recall measurably") {
    val embs = graft.Tables.embeddings(spark, SfDir)
    val q = graft.SparkEntry.QueryVec
    val exact = VectorSearch.topK(embs, "vec_id", "embedding", q, 10)
    assert(VectorSearch.recallAtK(exact, exact) === 1.0)
    // full-candidate quantized rerank recovers everything
    val quant = VectorSearch.quantizedTopK(embs, "vec_id", "embedding",
      q, 10, 64, numCandidates = 1000)
    assert(VectorSearch.recallAtK(quant, exact) === 1.0)
    // a radius-0 probe is a strict subset: recall in [0, 1]
    val tight = VectorSearch.annTopK(embs, "vec_id", "embedding", q, 10, 64,
      nBits = 8, probeHammingRadius = 0)
    val r = VectorSearch.recallAtK(tight, exact)
    assert(r >= 0.0 && r <= 1.0)
    // widening the probe can only help (monotone knob)
    val wide = VectorSearch.annTopK(embs, "vec_id", "embedding", q, 10, 64,
      nBits = 8, probeHammingRadius = 8)
    assert(VectorSearch.recallAtK(wide, exact) >= r)
  }

  test("quantizeVec: int8 range, floor semantics, degenerate dims to 0") {
    val mn = Array(0.0, -1.0, 5.0)
    val mx = Array(1.0, 1.0, 5.0)
    val qv = VectorSearch.quantizeVec(Array(0.0f, 1.0f, 5.0f), mn, mx)
    assert(qv(0) === -128L)            // min of range
    assert(qv(1) === 127L)             // max of range: floor(255)-128
    assert(qv(2) === 0L)               // mn == mx guard
    val mid = VectorSearch.quantizeVec(Array(0.5f, 0.0f, 5.0f), mn, mx)
    assert(mid(0) === math.floor(0.5 * 255.0).toLong - 128L)
    assert(mid.forall(v => v >= -128L && v <= 127L))
  }

  test("hybrid search: fuses boosts, applies min_score and size (reference Q3)") {
    val e = DeterministicEmbedder(64)
    val d = Seq(
      (1L, "spark join merge sort window", "en", "s", 10L),
      (2L, "spark join", "en", "s", 10L),
      (3L, "zzz", "en", "s", 10L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val v = d.select(col("doc_id").as("vec_id"), col("text")).as[(Long, String)]
      .map { case (id, t) => (id, e.embed(t).toSeq) }.toDF("vec_id", "embedding")
    val res = HybridSearch.search(d, v, "spark join merge sort window", e)
      .collect()
    assert(res.head.getAs[Long]("doc_id") === 1L)
    // doc 1: text 1.0*1.0 + vec 0.8*1.0 = 1.8
    assert(math.abs(res.head.getAs[Double]("score") - 1.8) < 1e-5)
    // doc 3 scores ~0 < min_score 0.5 → excluded
    assert(!res.map(_.getAs[Long]("doc_id")).contains(3L))
  }

  test("rrf fusion: rank-1 in both lists tops; score is sum of reciprocals") {
    val e = DeterministicEmbedder(64)
    val d = Seq(
      (1L, "spark join merge sort window", "en", "s", 10L),
      (2L, "spark join", "en", "s", 10L),
      (3L, "zzz", "en", "s", 10L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val v = d.select(col("doc_id").as("vec_id"), col("text")).as[(Long, String)]
      .map { case (id, t) => (id, e.embed(t).toSeq) }.toDF("vec_id", "embedding")
    val res = HybridSearch.searchRrf(d, v, "spark join merge sort window", e)
      .collect()
    assert(res.head.getAs[Long]("doc_id") === 1L)
    // doc 1 is rank 1 on both lists: 1/61 + 1/61
    assert(math.abs(res.head.getAs[Double]("score") - 2.0 / 61.0) < 1e-5)
    // rank-based: doc 3 still appears (vector list has no floor) but last
    assert(res.last.getAs[Long]("doc_id") === 3L)
  }

  test("evalRanking: hand-checked NDCG/MRR/recall on tiny frames") {
    def run(sys: Seq[(Long, Double)], truth: Seq[(Long, Double)], k: Int) = {
      val r = VectorSearch.evalRanking(
        sys.toDF("doc_id", "score"), truth.toDF("doc_id", "score"), k).head()
      (r.getDouble(0), r.getDouble(1), r.getDouble(2))
    }
    val truth = Seq((1L, 0.9), (2L, 0.8), (3L, 0.7))
    // perfect system: all three metrics 1.0
    assert(run(truth, truth, 3) === ((1.0, 1.0, 1.0)))
    // one relevant doc at system rank 2: mrr = 1/2, recall = 1/3,
    // ndcg = (1/log2(3)) / (1 + 1/log2(3) + 1/2)
    val (ndcg, mrr, rec) = run(Seq((9L, 0.9), (1L, 0.8), (8L, 0.7)), truth, 3)
    val l2 = (x: Double) => math.log(x) / math.log(2.0)
    assert(math.abs(ndcg - (1.0 / l2(3)) / (1.0 + 1.0 / l2(3) + 0.5)) < 1e-6)
    assert(mrr === 0.5)
    assert(math.abs(rec - 1.0 / 3.0) < 1e-6)
    // no overlap: all zeros, no division-by-null errors
    assert(run(Seq((7L, 0.9)), truth, 3) === ((0.0, 0.0, 0.0)))
  }

  test("percolate: AND semantics per standing query; multi-match docs fan out") {
    val d = Seq(
      (1L, "spark join window"),   // matches q1 (spark+window) and q2 (spark)
      (2L, "spark only here"),     // matches q2
      (3L, "window merge"),        // matches neither (q1 needs spark too)
      (4L, "spark window spark")   // duplicate terms count once; q1 + q2
    ).toDF("doc_id", "text")
    val qs = Seq(1L -> "spark window", 2L -> "spark", 3L -> "absentterm")
    val got = TextSearch.percolate(d, "doc_id", "text", qs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 1L), (1L, 2L), (2L, 2L), (4L, 1L), (4L, 2L)))
  }

  test("prfSearch: expansion terms learned from feedback docs recall " +
      "a document the raw query cannot reach") {
    import spark.implicits._
    val d = Seq((1L, "join shuffle"), (2L, "join shuffle"),
      (3L, "shuffle shuffle"), (4L, "exchange sort"))
      .toDF("doc_id", "text")
    val raw = TextSearch.bm25(d, "doc_id", "text", "join")
      .collect().map(_.getLong(0)).toSet
    assert(!raw.contains(3L), "raw query must miss doc 3")
    val prf = TextSearch.prfSearch(d, "doc_id", "text", "join",
      fbDocs = 2, expandK = 1, topK = 4)
      .collect().map(_.getLong(0)).toSet
    assert(prf.contains(3L),
      s"expanded query must recall doc 3 via 'shuffle': $prf")
    assert(!prf.contains(4L), "unrelated doc stays out")
  }
}
