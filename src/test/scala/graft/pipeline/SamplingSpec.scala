package graft.pipeline

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("hashSample: deterministic, rate-proportional, no shuffle decision") {
    val docs = Tables.documents(spark, SfDir)
    val s1 = Sampling.hashSample(docs, "doc_id", 0.3)
    val s2 = Sampling.hashSample(docs, "doc_id", 0.3)
    assert(s1.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ===
      s2.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
    val n = s1.count().toDouble / docs.count()
    assert(n > 0.2 && n < 0.4)
    // monotone: a larger rate strictly contains the smaller sample
    val big = Sampling.hashSample(docs, "doc_id", 0.6)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s1.select("doc_id").collect().map(_.getLong(0)).forall(big))
  }

  test("stratifiedTake: at most n per stratum, deterministic choice") {
    val docs = Tables.documents(spark, SfDir)
    val t = Sampling.stratifiedTake(docs, "lang", "doc_id", 7)
    val per = t.groupBy("lang").count().collect().map(_.getLong(1))
    assert(per.forall(_ <= 7))
    assert(t.count() ===
      Sampling.stratifiedTake(docs, "lang", "doc_id", 7).count())
  }

  test("tokenBudget: per-stratum running total within budget") {
    val df = Seq(
      ("en", 1L, 50L), ("en", 2L, 60L), ("en", 3L, 70L),
      ("fr", 10L, 100L), ("fr", 11L, 100L)
    ).toDF("lang", "doc_id", "n_tok")
    val kept = Sampling.tokenBudget(df, "lang", "doc_id", "n_tok", 120L)
    val perLang = kept.groupBy("lang").agg(sum("n_tok").as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perLang.values.forall(_ <= 120L))
    assert(kept.count() >= 2) // at least one admitted per stratum
  }

  test("mixtureTake: per-stratum quotas enforced, absent strata dropped") {
    import spark.implicits._
    val docs = (1L to 100L).map(i =>
      (i, if (i % 3 == 0) "en" else if (i % 3 == 1) "ko" else "zh"))
      .toDF("doc_id", "lang")
    val got = Sampling.mixtureTake(docs, "lang", "doc_id",
      Map("en" -> 5, "ko" -> 2))
      .groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("en" -> 5L, "ko" -> 2L)) // zh absent → dropped
    // deterministic pick
    val a = Sampling.mixtureTake(docs, "lang", "doc_id", Map("en" -> 5))
      .select("doc_id").as[Long].collect().sorted.toSeq
    val b = Sampling.mixtureTake(docs, "lang", "doc_id", Map("en" -> 5))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(a === b)
  }

  test("decontaminate: flags docs sharing benchmark shingles, keeps the rest") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "a quick brown fox appears in this training document"),
      (3L, "nothing in common with any benchmark at all here")
    ).toDF("doc_id", "text")
    val bench = Seq("the quick brown fox") // shingles: 2 of them
    val hits = Decontaminate.contaminated(docs, "doc_id", "text", bench)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits(1L) === 2L) // "the quick brown" + "quick brown fox"
    assert(hits(2L) === 1L) // "quick brown fox" only
    assert(!hits.contains(3L))
    val kept = Decontaminate.decontaminate(docs, "doc_id", "text", bench)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(3L))
  }

  test("contaminationScore: graded overlap fraction, clean docs score 0") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "a quick brown fox appears in this training document"),
      (3L, "nothing in common with any benchmark at all here")
    ).toDF("doc_id", "text")
    val bench = Seq("the quick brown fox")
    val got = Decontaminate.contaminationScore(docs, "doc_id", "text", bench)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // doc 1: 2 hits; doc 2: 1 hit; doc 3 (9 tokens → 7 shingles): clean
    assert(got(1L)._2 === 2L)
    assert(got(2L)._2 === 1L)
    assert(got(3L) === ((7L, 0L, 0.0)))
    assert(got(1L)._3 === math.rint(2.0 / got(1L)._1 * 1e6) / 1e6)
    // a doc too short for any shingle divides safely
    val tiny = Decontaminate.contaminationScore(
      Seq((9L, "hi")).toDF("doc_id", "text"), "doc_id", "text", bench)
      .head()
    assert(tiny.getLong(1) === 0L && tiny.getDouble(3) === 0.0)
  }

  test("curate: dedup + quality floor + budget compose") {
    val docs = Tables.documents(spark, SfDir)
    val c = Sampling.curate(docs, "doc_id", "text", "lang", 0.1, 2000L)
    assert(c.count() > 0)
    assert(c.columns.toSeq === docs.columns.toSeq)
  }

  test("quantileBuckets: ntile-like sizes, ties share a bucket, monotone") {
    // 100 distinct values → exact decile split, 10 per bucket
    val even = (1 to 100).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val b = Sampling.quantileBuckets(even, "v", 10)
      .select("id", "bucket").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert((1 to 100).forall(i => b(i.toLong) === (i - 1) / 10 + 1))
    // ties: all equal values land in ONE bucket (ntile would split them)
    val tied = (1 to 90).map(i => (i.toLong, 1.0)) ++
      Seq((91L, 0.5), (92L, 2.0))
    val tb = Sampling.quantileBuckets(tied.toDF("id", "v"), "v", 10)
      .select("id", "bucket").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert((1 to 90).map(i => tb(i.toLong)).toSet.size === 1)
    assert(tb(91L) === 1)        // below the tie mass
    assert(tb(92L) === 10)       // above: 91 rows below → 1+910/92 = 10
  }

  test("qualityDeciles: full partition of the corpus, ranges ordered") {
    val d = Sampling.qualityDeciles(Tables.documents(spark, SfDir), "text")
      .orderBy("decile").collect()
    assert(d.map(_.getLong(1)).sum ===
      Tables.documents(spark, SfDir).count())
    val ranges = d.map(r => (r.getInt(0), r.getDouble(2), r.getDouble(3)))
    ranges.foreach { case (_, mn, mx) => assert(mn <= mx) }
    // deciles are ordered by score range
    ranges.sliding(2).foreach {
      case Array((_, _, mx1), (_, mn2, _)) => assert(mx1 <= mn2)
      case _ =>
    }
  }

  test("shuffleShards: deterministic epoch shuffle, total partition, balanced") {
    val docs = Tables.documents(spark, SfDir)
    val a = Sampling.shuffleShards(docs, "doc_id", 8).collect()
    val b = Sampling.shuffleShards(docs, "doc_id", 8).collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq) // reproducible
    // total: every doc exactly once
    assert(a.length === docs.count())
    assert(a.map(_.getLong(1)).distinct.length === a.length)
    // positions are 1..n_shard within each shard, no gaps
    a.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getLong(2)).sorted.toSeq === (1L to rows.length).toSeq)
    }
    // statistically balanced: no shard more than 2x the mean
    val sizes = a.groupBy(_.getLong(0)).view.mapValues(_.length).values.toSeq
    assert(sizes.size === 8 && sizes.max <= 2 * (a.length / 8))
    // a different salt is a DIFFERENT epoch ordering
    val c = Sampling.shuffleShards(docs, "doc_id", 8, salt = "epoch2")
      .collect()
    assert(c.map(r => (r.getLong(0), r.getLong(1))).toSeq !==
      a.map(r => (r.getLong(0), r.getLong(1))).toSeq)
  }

  test("weightedSample: top-k by key, deterministic, weight-monotone") {
    val docs = graft.Tables.documents(spark, SfDir)
    val sel = Sampling.weightedSample(docs, "doc_id", "n_chars", 20)
      .collect()
    assert(sel.length === 20)
    // selected keys dominate every excluded key (true top-k, not a
    // per-partition artifact)
    val allKeys = Sampling.weightedSample(docs, "doc_id", "n_chars", 10000)
      .collect().map(r => r.getAs[Double]("sample_key"))
    val minSel = sel.map(_.getAs[Double]("sample_key")).min
    assert(allKeys.count(_ > minSel) < 20)
    // replay-identical
    val again = Sampling.weightedSample(docs, "doc_id", "n_chars", 20)
      .collect().map(_.getAs[Long]("doc_id")).toSeq
    assert(again === sel.map(_.getAs[Long]("doc_id")).toSeq)
    // raising a row's weight never lowers its key (A-ES monotonicity)
    import spark.implicits._
    val two = Seq((1L, 10L), (2L, 20L)).toDF("id", "w")
    val k1 = Sampling.weightedSample(two, "id", "w", 2)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("sample_key"))
      .toMap
    val boosted = Seq((1L, 500L), (2L, 20L)).toDF("id", "w")
    val k2 = Sampling.weightedSample(boosted, "id", "w", 2)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("sample_key"))
      .toMap
    assert(k2(1L) >= k1(1L))
    assert(k2(2L) === k1(2L))
  }

  test("neymanAllocation: allocations sum exactly to the budget, a " +
      "zero-variance stratum gets nothing, and the high-N*sigma " +
      "stratum dominates") {
    import org.apache.spark.sql.functions.col
    val rows =
      (0 until 8).map(i => ("a", if (i % 2 == 0) 0.0 else 10.0)) ++
      (0 until 100).map(_ => ("b", 5.0)) ++
      (0 until 4).map(i => ("c", if (i % 2 == 0) 0.0 else 100.0))
    val out = Sampling.neymanAllocation(rows.toDF("s", "v"), "s", "v", 10L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3))).toMap
    assert(out.values.map(_._3).sum == 10L)
    assert(out("b")._2 == 0.0 && out("b")._3 == 0L,
      s"constant stratum must get 0: $out")
    assert(out("c")._3 > out("a")._3, s"$out")
    // determinism under repartitioning
    val again = Sampling.neymanAllocation(
      rows.toDF("s", "v").repartition(7), "s", "v", 10L)
      .collect().map(_.toSeq).toSeq
    assert(again == Sampling.neymanAllocation(rows.toDF("s", "v"),
      "s", "v", 10L).collect().map(_.toSeq).toSeq)
  }
}
