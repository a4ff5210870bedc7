package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "the quick brown fox jumps over the lazy dog again and again"), // dup of 1
    (3L, "the quick brown fox jumps over the lazy cat again and again"), // near-dup
    (4L, "completely different content with nothing shared at all here"),
    (5L, "xy")                                                           // too short
  ).toDF("doc_id", "text")

  test("exactGroups: dup docs collapse to min id") {
    val g = Dedup.exactGroups(docs, "doc_id", "text").collect()
    assert(g.length === 4)
    val dup = g.find(_.getAs[Long]("n_copies") == 2L).get
    assert(dup.getAs[Long]("keep_id") === 1L)
  }

  test("exactDedup keeps one row per content") {
    val kept = Dedup.exactDedup(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted
    assert(kept === Array(1L, 3L, 4L, 5L))
  }

  test("minhash: identical docs get identical signatures; sigs differ across docs") {
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(sigs(1L) === sigs(2L))
    assert(sigs(1L) != sigs(4L))
  }

  test("minhash candidate pairs find exact and near dups, not unrelated") {
    val pairs = Dedup.minhashCandidatePairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.forall { case (a, b) => a < b })
    assert(!pairs.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("incremental gate: batch dup of an indexed doc is caught; new content passes") {
    // corpus = ids 1,4 (indexed once); batch = 2 (dup of 1), 3 (near-dup
    // of 1), 6 (genuinely new)
    val corpus = docs.filter(col("doc_id").isin(1L, 4L))
    val batch  = docs.filter(col("doc_id").isin(2L, 3L))
      .union(Seq((6L, "entirely novel text that matches no indexed band at all ok"))
        .toDF("doc_id", "text"))
    val idx = Dedup.minhashBandIndex(corpus, "doc_id", "text")
    val pairs = Dedup.incrementalCandidatePairs(idx, batch, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))        // exact dup flagged
    assert(!pairs.exists(_._2 == 6L))       // new content not flagged
    assert(!pairs.exists { case (a, _) => a == 2L || a == 3L || a == 6L })
    // equivalence: incremental == full-corpus pairs restricted to
    // corpus x batch (caps not binding at this size)
    val full = Dedup.minhashCandidatePairs(docs.union(
      Seq((6L, "entirely novel text that matches no indexed band at all ok"))
        .toDF("doc_id", "text")), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val restricted = full.filter { case (a, b) =>
      Set(1L, 4L).contains(a) && Set(2L, 3L, 6L).contains(b) }
    assert(pairs === restricted)
  }

  test("editDistanceVerifiedPairs: dup at 0; boilerplate shift small; cut past maxDist") {
    val d = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "the quick brown fox jumps over the lazy cat again and again"),
      (4L, "completely different content with nothing shared at all here")
    ).toDF("doc_id", "text")
    // wide hamming rung: the edit-distance semantics alone
    val ps = Dedup.editDistanceVerifiedPairs(d, "doc_id", "text",
      prefixLen = 80, maxDist = 5, maxHamming = Dedup.SimHashBits)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(ps((1L, 2L)) === 0)           // exact dup
    assert(ps.get((1L, 3L)).exists(x => x > 0 && x <= 5)) // dog→cat
    assert(!ps.keySet.exists { case (a, b) => a == 4L || b == 4L })
    // tight edit threshold cuts the near-dup but keeps the exact dup
    val tight = Dedup.editDistanceVerifiedPairs(d, "doc_id", "text",
      prefixLen = 80, maxDist = 0, maxHamming = Dedup.SimHashBits)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(tight === Set((1L, 2L)))
    // the default hamming rung still admits exact dups (hamming 0)
    val ladder = Dedup.editDistanceVerifiedPairs(d, "doc_id", "text",
      prefixLen = 80, maxDist = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ladder.contains((1L, 2L)))
  }

  test("ngram jaccard: identical docs = 1.0; near-dups in (0,1); thresholded") {
    val j = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.01)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(j((1L, 2L)) === 1.0)
    val near = j((1L, 3L))
    assert(near > 0.0 && near < 1.0)
    assert(!j.contains((1L, 4L)))
  }

  test("simhash: identical docs equal; near-dups within small hamming distance") {
    val s = Dedup.simhash(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s(1L) === s(2L))
    val ham = java.lang.Long.bitCount(s(1L) ^ s(3L))
    val hamFar = java.lang.Long.bitCount(s(1L) ^ s(4L))
    assert(ham < hamFar)
  }

  test("simhash candidate pairs include exact dups") {
    val pairs = Dedup.simhashCandidatePairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("hot key: an over-cap LSH group is dropped, small groups survive") {
    // 10k docs sharing one text → every band is a 10k-member hot group;
    // two near-dup docs with distinct text form a small group. With the
    // cap the hot group yields ZERO pairs (not ~50M) and the buffer never
    // exceeds cap+1 elements, while the small group still pairs up.
    val hot = (1L to 10000L).map(i => (i, "spam spam spam spam wonderful spam spam spam"))
    // identical text → identical signatures: guaranteed to pair under
    // all three generators (a near-dup's quarter match is data-dependent)
    val fine = Seq(
      (20001L, "a genuinely unique document about distributed query engines"),
      (20002L, "a genuinely unique document about distributed query engines"))
    val all = (hot ++ fine).toDF("doc_id", "text").repartition(8)
    val pairs = Dedup.minhashCandidatePairs(all, "doc_id", "text",
        maxGroupSize = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((20001L, 20002L)))
    val sim = Dedup.simhashCandidatePairs(all, "doc_id", "text",
        maxGroupSize = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sim.contains((20001L, 20002L)))
    assert(!sim.exists { case (a, b) => a <= 10000L || b <= 10000L })
    val jac = Dedup.ngramJaccardPairs(all, "doc_id", "text", 0.01,
        maxGroupSize = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(jac === Set((20001L, 20002L)))
  }

  test("bounded collect: cap exactly at group size keeps the group") {
    val docs3 = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "alpha beta gamma delta epsilon eta")).toDF("doc_id", "text")
    val pairs = Dedup.minhashCandidatePairs(docs3, "doc_id", "text",
        maxGroupSize = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L))) // group of exactly 3 is NOT dropped
  }

  test("simhash verified pairs: exact dups at hamming 0; candidates past the distance are cut") {
    val verified = Dedup.simhashVerifiedPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(verified((1L, 2L)) === 0)
    assert(verified.values.forall(_ <= 3))
    // candidate stage alone admits more pairs than the verify lets through
    val candidates = Dedup.simhashCandidatePairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(verified.keySet.subsetOf(candidates))
  }

  test("nearDupClusters: chains collapse to min id, singletons label themselves") {
    import spark.implicits._
    val ids = (1L to 8L).map(Tuple1(_)).toDF("doc_id")
    // chain 1-2-3 (transitive through 2), pair 5-6, singletons 4,7,8
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("a", "b")
    val got = Dedup.nearDupClusters(ids, "doc_id", pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L,
      5L -> 5L, 6L -> 5L, 7L -> 7L, 8L -> 8L))
  }

  test("nearDupClusters on real candidate pairs: labels are cluster minima") {
    val pairs = Dedup.minhashCandidatePairs(docs, "doc_id", "text")
    val got = Dedup.nearDupClusters(docs, "doc_id", pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) === 1L && got(2L) === 1L) // dup pair collapses
    assert(got(4L) === 4L)                   // unrelated doc stays itself
    // every label is itself labeled by itself (fixpoint reached)
    got.values.foreach(l => assert(got(l) === l))
  }

  test("embedding near-dup pairs: identical vectors found with cos 1.0") {
    val e = graft.embed.DeterministicEmbedder(64)
    val vecs = Seq(
      (1L, e.embed("alpha beta gamma").toSeq),
      (2L, e.embed("alpha beta gamma").toSeq),
      (3L, e.embed("totally different thing").toSeq)
    ).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDupPairs(vecs, "vec_id", "embedding", 64, 0.99)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    assert(pairs.map(_._1).toSet === Set((1L, 2L)))
    assert(math.abs(pairs.head._2 - 1.0) < 1e-6)
  }

  test("semDedup: anchor cells bound pairs; dup groups keep min id") {
    val e = graft.embed.DeterministicEmbedder(64)
    // two well-separated semantic poles, with near-dups at each
    val vecs = Seq(
      (1L, e.embed("alpha beta gamma").toSeq),
      (2L, e.embed("alpha beta gamma").toSeq),      // dup of 1
      (3L, e.embed("alpha beta gamma delta").toSeq), // near 1/2
      (10L, e.embed("totally different thing").toSeq),
      (11L, e.embed("totally different thing").toSeq), // dup of 10
      (12L, e.embed("unrelated third topic entirely").toSeq)
    ).toDF("vec_id", "embedding")
    val anchors = Seq(e.embed("alpha beta gamma"),
      e.embed("totally different thing")).map(_.clone)
    val got = Dedup.semDedup(vecs, "vec_id", "embedding", anchors,
      tau = 0.99).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2),
        r.getBoolean(3))).toMap
    assert(got.keySet === Set(1L, 2L, 3L, 10L, 11L, 12L))
    // exact dups group to the min id; the rep keeps, the dup drops
    assert(got(1L)._2 === 1L && got(1L)._3)
    assert(got(2L)._2 === 1L && !got(2L)._3)
    assert(got(10L)._2 === 10L && got(10L)._3)
    assert(got(11L)._2 === 10L && !got(11L)._3)
    // non-dups are their own cluster and keep
    assert(got(3L)._3 && got(12L)._3)
    // cells: the two poles land on their own anchors
    assert(got(1L)._1 === 0 && got(10L)._1 === 1)
    assert(got(1L)._1 === got(2L)._1 && got(10L)._1 === got(11L)._1)
  }

  test("semDedupIncremental: corpus dups drop, survivors group among themselves") {
    val e = graft.embed.DeterministicEmbedder(64)
    val existing = Seq(
      (1L, e.embed("alpha beta gamma").toSeq),
      (2L, e.embed("alpha beta gamma").toSeq),
      (10L, e.embed("totally different thing").toSeq)
    ).toDF("vec_id", "embedding")
    val batch = Seq(
      (100L, e.embed("alpha beta gamma").toSeq),          // dup of corpus
      (101L, e.embed("third topic entirely new").toSeq),  // new, dup of 102
      (102L, e.embed("third topic entirely new").toSeq),
      (103L, e.embed("fourth lonely subject").toSeq)      // new, unique
    ).toDF("vec_id", "embedding")
    val anchors = Seq(e.embed("alpha beta gamma"),
      e.embed("totally different thing"))
    val got = Dedup.semDedupIncremental(existing, batch, "vec_id",
      "embedding", anchors, tau = 0.99)
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(2), r.getLong(3), r.getBoolean(4))).toMap
    assert(got.keySet === Set(100L, 101L, 102L, 103L)) // batch rows only
    assert(got(100L) === ((true, 100L, false))) // corpus dup: dropped
    assert(got(101L) === ((false, 101L, true))) // group rep: kept
    assert(got(102L) === ((false, 101L, false))) // in-batch dup: dropped
    assert(got(103L) === ((false, 103L, true))) // unique: kept
  }

  test("semDedupKMeans: learned cells satisfy the SemDeDup invariants") {
    val embs = graft.Tables.embeddings(spark, SfDir)
    val tau = 0.2
    val got = Dedup.semDedupKMeans(embs, "vec_id", "embedding",
      k = 8, tau = tau).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getBoolean(3)))
    val n = embs.count()
    assert(got.length === n) // one row per vector, cells partition the corpus
    assert(got.forall { case (id, _, cl, keep) => keep === (id == cl) })
    // cluster label is the group min: no member sits below its label
    assert(got.forall { case (id, _, cl, _) => cl <= id })
    // every dropped doc is genuinely connected: some same-cell groupmate
    // sits within cos >= tau — recomputed brute-force, independent of
    // the operator's pair path
    val vecsById = embs.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      if (na == 0 || nb == 0) 0.0 else dot / (na * nb)
    }
    val cellOf = got.map(g => g._1 -> g._2).toMap
    val members = got.groupBy(_._3)
    val dropped = got.filterNot(_._4)
    assert(dropped.nonEmpty, "fixture has semantic near-dups at tau 0.2")
    dropped.foreach { case (id, cell, cl, _) =>
      val group = members(cl).map(_._1).filterNot(_ == id)
      assert(group.exists(o => cellOf(o) == cell &&
        cos(vecsById(id), vecsById(o)) >= tau - 1e-6),
        s"dropped $id has no same-cell groupmate above tau")
    }
  }

  test("winnowDupPairs: exact/near dups pair with high shared counts; unrelated don't") {
    val pairs = Dedup.winnowDupPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // identical docs share EVERY fingerprint; the near-dup shares most;
    // doc 4 shares nothing with anyone
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)) && pairs.contains((2L, 3L)))
    assert(!pairs.keys.exists(p => p._1 == 4L || p._2 == 4L))
    assert(pairs((1L, 2L)) >= pairs((1L, 3L))) // dup >= near-dup overlap
    // shared counts recompute from the raw fingerprint sets
    def fpSet(t: String): Set[Long] =
      Seq(t).toDF("text").select(graft.text.TextAnalysis
          .winnowFingerprints(col("text"), 16, 8).as("f"))
        .head().getSeq[Long](0).toSet
    val t1 = docs.filter(col("doc_id") === 1L).head().getString(1)
    val t3 = docs.filter(col("doc_id") === 3L).head().getString(1)
    assert(pairs((1L, 3L)) === (fpSet(t1) intersect fpSet(t3)).size.toLong)
  }

  test("substringDupSpans: maximal shared-window spans, merged and bounded") {
    // docs 1 and 2 share a 10-token passage (→ 3 windows at k=8, one
    // merged span of length 10); doc 3 is unique; doc 4 is too short
    val shared = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    val d = Seq(
      (1L, s"$shared unique tail one two three four five six seven eight"),
      (2L, s"prefix0 prefix1 $shared other ending words entirely different"),
      (3L, "nothing here repeats anywhere else in this corpus at all okay"),
      (4L, "short")
    ).toDF("doc_id", "text")
    val spans = Dedup.substringDupSpans(d, "doc_id", "text", k = 8)
      .orderBy("doc", "span_start").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // doc 1: passage at tokens 1..10; doc 2: at tokens 3..12
    assert(spans === Array((1L, 1L, 10L, 3L), (2L, 3L, 12L, 3L)))
  }

  test("cutDupSpans: duplicated spans removed, unique docs untouched") {
    val shared = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    val d = Seq(
      (1L, s"$shared unique tail one two three four five six seven eight"),
      (2L, s"prefix0 prefix1 $shared other ending words entirely different"),
      (3L, "nothing here repeats anywhere else in this corpus at all okay")
    ).toDF("doc_id", "text")
    val cut = Dedup.cutDupSpans(d, "doc_id", "text", k = 8)
      .orderBy("doc").collect()
    // doc 1: tokens 1-10 (the shared passage) cut, the tail kept
    assert(cut(0).getAs[String]("clean_text") ===
      "unique tail one two three four five six seven eight")
    assert(cut(0).getAs[Long]("n_tokens_cut") === 10L)
    // doc 2: passage at tokens 3-12 cut, prefix + ending kept
    assert(cut(1).getAs[String]("clean_text") ===
      "prefix0 prefix1 other ending words entirely different")
    assert(cut(1).getAs[Long]("n_tokens_cut") === 10L)
    // doc 3: nothing shared — byte-identical token stream, zero cut
    assert(cut(2).getAs[String]("clean_text") ===
      "nothing here repeats anywhere else in this corpus at all okay")
    assert(cut(2).getAs[Long]("n_tokens_cut") === 0L)
  }

  test("substringDupSpans: repeated passage in one doc yields both spans") {
    // doc 1 contains the cross-doc-shared passage TWICE (tokens 1-10 and
    // 11-20). Cross-doc duplicated window starts are 1,2,3 and 11,12,13
    // (seam windows exist only in doc 1, so they are not duplicated) —
    // two islands, two maximal spans. Within-one-doc repeats alone never
    // count: dup-ness requires min(doc) != max(doc).
    val p = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    val d = Seq(
      (1L, s"$p $p"),
      (2L, s"lead-in words $p and a tail after")
    ).toDF("doc_id", "text")
    val spans = Dedup.substringDupSpans(d, "doc_id", "text", k = 8)
      .filter(col("doc") === 1L).orderBy("span_start").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(spans === Array((1L, 10L, 3L), (11L, 20L, 3L)))
  }

  test("containment flags a doc embedded in a longer one where jaccard dilutes") {
    val core = "alpha bravo charlie delta echo foxtrot golf hotel"
    val pad = (1 to 40).map(i => s"pad$i").mkString(" ")
    val d = Seq(
      (1L, core),                 // short doc
      (2L, s"$pad $core")         // long doc containing it verbatim
    ).toDF("doc_id", "text")
    val row = Dedup.containmentPairs(d, "doc_id", "text", 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(row.length === 1)
    val (a, b, ca, cb, mx) = row.head
    assert((a, b) === (1L, 2L))
    assert(ca === 1.0, s"all of doc 1's shingles occur in doc 2: $ca")
    assert(cb < 0.5, "containment of the long doc must stay low")
    assert(mx === 1.0)
    // jaccard on the same pair is diluted well below the containment
    val j = Dedup.ngramJaccardPairs(d, "doc_id", "text", 0.0)
      .collect().head.getDouble(2)
    assert(j < 0.5, s"jaccard should dilute the embedded doc: $j")
  }

  test("keepBestPerCluster: one survivor per cluster — max score, ties to min id") {
    val scored = Seq(
      (1L, 0.5), (2L, 0.9), (3L, 0.9), // cluster 10: 2 and 3 tie on 0.9
      (4L, 0.2),                       // singleton cluster 40
      (5L, 0.1), (6L, 0.7)             // cluster 50: 6 wins
    ).toDF("doc_id", "score")
    val clusters = Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 40L),
      (5L, 50L), (6L, 50L)).toDF("doc_id", "cluster_id")
    val out = Dedup.keepBestPerCluster(scored, "doc_id", clusters, "score")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("keep"))
      .toMap
    assert(out === Map(1L -> false, 2L -> true, 3L -> false,
      4L -> true, 5L -> false, 6L -> true))
  }

  test("lshPlanCurve: monotone S-curve, proper endpoints, threshold near 50% detection") {
    val rows = Dedup.lshPlanCurve(spark).orderBy("jaccard_s").collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
    assert(rows.length === 20)
    // monotone nondecreasing in s; certain detection at s=1
    assert(rows.sliding(2).forall { case Array(a, b) => b._2 >= a._2 })
    assert(rows.last._2 === 1.0)
    assert(rows.head._2 < 0.05)
    // at the scheme threshold s* = (1/b)^(1/r) the curve sits at
    // 1-(1-1/b)^b (≈ 1-1/e for large b) — pin the identity, not a
    // mistaken 50% crossing
    val thr = rows.head._3
    assert(thr > 0.0 && thr < 1.0)
    val b = Dedup.NumHashes / Dedup.BandSize
    val atThr = 1.0 - math.pow(1.0 - 1.0 / b, b)
    val nearest = rows.minBy(r => math.abs(r._1 - thr))
    assert(math.abs(nearest._2 - atThr) < 0.05,
      s"curve at s*=$thr is ${nearest._2}, expected ~$atThr")
  }

  test("blockDedup keeps the globally first block occurrence and reassembles") {
    val blk = (1 to 16).map(i => s"w$i").mkString(" ") // one exact block
    val d = Seq(
      (1L, s"$blk unique one two"),    // doc 1: block 0 = blk (first)
      (2L, s"$blk other tail words"),  // doc 2: block 0 = same → dropped
      (3L, "totally different words here")
    ).toDF("doc_id", "text")
    val out = Dedup.blockDedup(d, "doc_id", "text", 16)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(1L)._1 === s"$blk unique one two")
    assert(out(1L)._2 === 0L)
    assert(out(2L)._1 === "other tail words") // trailing partial block kept
    assert(out(2L)._2 === 1L)
    assert(out(3L)._2 === 0L)
    // in-doc repeat of an identical block is also cut (keep-first)
    val rep = Seq((9L, s"$blk $blk")).toDF("doc_id", "text")
    val r9 = Dedup.blockDedup(rep, "doc_id", "text", 16).collect().head
    assert(r9.getString(1) === blk)
    assert(r9.getLong(2) === 1L)
  }
}
