package graft.functions

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("kmv estimate within 35% of exact for k=64 on real data") {
    val li = Tables.lineitem(spark, SfDir)
    val est = Sketches.kmvDistinct(li, "l_returnflag", "l_partkey", 64)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct("l_partkey").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (g, n) =>
      val e = est(g)
      assert(math.abs(e - n) / n.toDouble < 0.35, s"$g: est $e vs exact $n")
    }
  }

  test("native aggregate is bit-identical to the DF-algebra form") {
    val li = Tables.lineitem(spark, SfDir)
    val native = Sketches.kmvDistinct(li, "l_returnflag", "l_partkey", 64)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val algebra = Sketches.kmvDistinctDf(li, "l_returnflag", "l_partkey", 64)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(native === algebra)
  }

  test("typed aggregates survive the sort-based fallback (serialize/merge path)") {
    // ObjectHashAggregate falls back to sort-based aggregation past the
    // fallback threshold — that path exercises serialize/deserialize/
    // merge of the custom buffers. Force it and require identical
    // results to the hash path.
    val li = Tables.lineitem(spark, SfDir)
    val key = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    val prev = spark.conf.get(key)
    val hashPath = Sketches.kmvDistinct(li, "l_returnflag", "l_partkey", 64)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val boundedHash = li.groupBy("l_returnflag")
      .agg(org.apache.spark.sql.functions.size(
        org.apache.spark.sql.graftext.BoundedCollectAgg.boundedCollectSet(
          org.apache.spark.sql.functions.col("l_linenumber"), 100))
        .as("n")).collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    try {
      spark.conf.set(key, "1") // every group falls back immediately
      val sortPath = Sketches.kmvDistinct(li, "l_returnflag", "l_partkey", 64)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(sortPath === hashPath)
      val boundedSort = li.groupBy("l_returnflag")
        .agg(org.apache.spark.sql.functions.size(
          org.apache.spark.sql.graftext.BoundedCollectAgg.boundedCollectSet(
            org.apache.spark.sql.functions.col("l_linenumber"), 100))
          .as("n")).collect().map(r => r.getString(0) -> r.getInt(1)).toMap
      assert(boundedSort === boundedHash)
    } finally spark.conf.set(key, prev)
  }

  test("topk_freq: exact top-n when capacity covers distinct cardinality") {
    val docs = Tables.documents(spark, SfDir)
    val got = Sketches.topKFrequent(docs, "lang", "source", 64, 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val exact = docs.groupBy("lang", "source").count()
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1).toSeq.flatMap { case (_, rows) =>
        rows.sortBy(t => (-t._3, t._2)).take(3).toSeq
      }.toSet
    assert(got.toSet === exact)
    // per-group output ordering is (cnt desc, term asc)
    got.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.sortBy(t => (-t._3, t._2)).toSeq === rows.toSeq)
    }
  }

  test("topk_freq: bounded buffer keeps the heavy hitter under skew") {
    // 1000 occurrences of "hot" interleaved with 500 singletons; a
    // capacity-8 Space-Saving buffer must still report "hot" first with
    // count >= its true count (over-estimate only, never under).
    val rows = (0 until 1000).map(i => ("g", "hot")) ++
      (0 until 500).map(i => ("g", s"rare$i"))
    val df = rows.toDF("g", "v").repartition(7) // force partial merges
    val top = Sketches.topKFrequent(df, "g", "v", 8, 1).collect()
    assert(top.length === 1)
    assert(top.head.getString(1) === "hot")
    assert(top.head.getLong(2) >= 1000L)
  }

  test("topk_freq: sort-based fallback path matches hash path") {
    val docs = Tables.documents(spark, SfDir)
    val key = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    val prev = spark.conf.get(key)
    val hashPath = Sketches.topKFrequent(docs, "lang", "source", 64, 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    try {
      spark.conf.set(key, "1")
      val sortPath = Sketches.topKFrequent(docs, "lang", "source", 64, 3)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      assert(sortPath === hashPath)
    } finally spark.conf.set(key, prev)
  }

  test("kmv is exact below k and deterministic") {
    val small = Seq(("a", 1), ("a", 2), ("a", 2), ("b", 9))
      .toDF("g", "v")
    val est = Sketches.kmvDistinct(small, "g", "v", 64)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(est("a") === 2.0)
    assert(est("b") === 1.0)
    val again = Sketches.kmvDistinct(small, "g", "v", 64)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(again === est)
  }

  // ---- quantile sketch ---------------------------------------------------

  private def qsketch(df: org.apache.spark.sql.DataFrame, colName: String,
      cap: Int, ps: Seq[Double]): Seq[Double] =
    df.agg(org.apache.spark.sql.graftext.QuantileSketchAgg
        .quantileSketch(col(colName).cast("double"), cap, ps).as("q"))
      .collect()(0).getSeq[Double](0)

  test("quantile sketch unsaturated = exact percentile() bit-for-bit") {
    val li = Tables.lineitem(spark, SfDir)
    val n = li.count().toInt
    val ps = Seq(0.0, 0.25, 0.5, 0.75, 0.9, 1.0)
    val exact = li.agg(expr(
      "percentile(cast(l_quantity AS double), array(0.0D,0.25D,0.5D,0.75D,0.9D,1.0D))").as("p"))
      .collect()(0).getSeq[Double](0)
    val sk = qsketch(li, "l_quantity", n + 10, ps)
    assert(sk === exact)
  }

  test("quantile sketch saturated: bounded rank error, deterministic, merge-safe") {
    val li = Tables.lineitem(spark, SfDir).select(
      col("l_extendedprice").cast("double").as("v"))
    val ps = Seq(0.1, 0.5, 0.9)
    val exact = li.agg(expr(
      "percentile(v, array(0.1D, 0.5D, 0.9D))").as("p"))
      .collect()(0).getSeq[Double](0)
    // capacity far below n: compaction engaged; results must stay close
    // in RANK (compare via the exact CDF) and be run-to-run stable
    val sk = qsketch(li, "v", 256, ps)
    val n = li.count().toDouble
    ps.indices.foreach { i =>
      val rankOfEstimate =
        li.filter(col("v") <= sk(i)).count().toDouble / n
      assert(math.abs(rankOfEstimate - ps(i)) < 0.1,
        s"p=${ps(i)}: estimate ${sk(i)} sits at rank $rankOfEstimate")
    }
    assert(qsketch(li, "v", 256, ps) === sk)
    // quantiles are monotone in p
    assert(sk === sk.sorted)
    info(s"exact $exact vs sketch $sk (capacity 256, n=${n.toInt})")
  }

  test("property: saturated sketch stays within [min, max] and monotone") {
    val rnd = new scala.util.Random(42)
    val ps = Seq(0.05, 0.25, 0.5, 0.75, 0.95)
    (1 to 5).foreach { trial =>
      val vals = Seq.fill(2000)(rnd.nextDouble() * math.pow(10, trial))
      val df = vals.toDF("v")
      val sk = qsketch(df, "v", 64, ps)
      assert(sk === sk.sorted, s"trial $trial: not monotone: $sk")
      assert(sk.head >= vals.min - 1e-9 && sk.last <= vals.max + 1e-9,
        s"trial $trial: out of range")
    }
  }

  test("quantile sketch groups independently and handles tiny groups") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 10.0))
      .toDF("g", "v")
    val r = df.groupBy("g")
      .agg(org.apache.spark.sql.graftext.QuantileSketchAgg
        .quantileSketch(col("v"), 64, Seq(0.5)).as("q"))
      .collect().map(x => x.getString(0) -> x.getSeq[Double](1).head).toMap
    assert(r("a") === 2.0)
    assert(r("b") === 10.0)
  }

  // ---- HyperLogLog -------------------------------------------------------

  test("hll: native aggregate is bit-identical to the DF-algebra form") {
    val li = Tables.lineitem(spark, SfDir)
    val native = Sketches.hllDistinct(li, "l_returnflag", "l_partkey")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val algebra = Sketches.hllDistinctDf(li, "l_returnflag", "l_partkey")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(native === algebra)
  }

  test("hll: estimate within 40% of exact per group, 20% on average") {
    // m = 64 -> standard error ~1.04/sqrt(64) = 13%; 40% is ~3 sigma.
    val li = Tables.lineitem(spark, SfDir)
    val est = Sketches.hllDistinct(li, "l_returnflag", "l_partkey")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct("l_partkey").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val errs = exact.map { case (g, n) =>
      val e = math.abs(est(g) - n) / n.toDouble
      assert(e < 0.40, s"$g: est ${est(g)} vs exact $n")
      e
    }
    assert(errs.sum / errs.size < 0.20, s"mean err ${errs.sum / errs.size}")
  }

  test("hll: partitioning-invariant (merge path ≡ single-buffer path)") {
    val li = Tables.lineitem(spark, SfDir)
    val one = Sketches.hllDistinct(li.coalesce(1), "l_returnflag", "l_partkey")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val many = Sketches.hllDistinct(li.repartition(13), "l_returnflag", "l_partkey")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(one === many)
  }

  test("hll: sort-based fallback path matches hash path") {
    val li = Tables.lineitem(spark, SfDir)
    val key = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    val prev = spark.conf.get(key)
    val hashPath = Sketches.hllDistinct(li, "l_returnflag", "l_partkey")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    try {
      spark.conf.set(key, "1")
      val sortPath = Sketches.hllDistinct(li, "l_returnflag", "l_partkey")
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(sortPath === hashPath)
    } finally spark.conf.set(key, prev)
  }

  test("hll: register-table rollup merge ≡ direct estimate, any split") {
    val li = Tables.lineitem(spark, SfDir)
    val direct = Sketches.hllDistinct(li, "l_returnflag", "l_partkey")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    for (nSplits <- Seq(2, 5)) {
      val parts = (0 until nSplits).map(i =>
        Sketches.hllRegisters(
          li.filter(col("l_orderkey") % nSplits === i),
          "l_returnflag", "l_partkey"))
      val merged = Sketches.hllFromRegisters(
        parts.reduce(_ unionByName _), "l_returnflag")
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(merged === direct, s"$nSplits-way split")
    }
  }

  // ---- KMV set operations ------------------------------------------------

  test("kmv set ops: exact below saturation, and union sketch is closed") {
    val docs = Tables.documents(spark, SfDir)
    val toks = docs.select(col("lang"),
      explode(graft.functions.TextFunctions.tokens(col("text"))).as("tok"))
    def tokSet(l: String) = toks.filter(col("lang") === l)
      .select("tok").distinct().collect().map(_.getString(0)).toSet
    val (sa, sb) = (tokSet("en"), tokSet("de"))
    // vocab is far below k → every estimate must be exact
    val k = 128
    assert(sa.size < k && sb.size < k, "fixture assumption: unsaturated")
    val r = Sketches.kmvSetOps(
      Sketches.kmvMinHashes(toks.filter(col("lang") === "en"), "tok", k),
      Sketches.kmvMinHashes(toks.filter(col("lang") === "de"), "tok", k),
      k).collect().head
    assert(r.getAs[Double]("est_a") === sa.size.toDouble)
    assert(r.getAs[Double]("est_b") === sb.size.toDouble)
    assert(r.getAs[Double]("est_union") === (sa ++ sb).size.toDouble)
    val exactJ = (sa & sb).size.toDouble / (sa ++ sb).size
    assert(math.abs(r.getAs[Double]("jaccard") - exactJ) < 1e-6)
    assert(math.abs(r.getAs[Double]("est_intersect") - (sa & sb).size) < 0.01)
  }

  test("kmv set ops: saturated sketches still estimate within 40%") {
    // per-key value sets larger than k — the estimation regime
    val li = Tables.lineitem(spark, SfDir)
    val k = 32
    def side(flag: String) = Sketches.kmvMinHashes(
      li.filter(col("l_returnflag") === flag), "l_partkey", k)
    val r = Sketches.kmvSetOps(side("A"), side("N"), k).collect().head
    def exact(flag: String) = li.filter(col("l_returnflag") === flag)
      .select("l_partkey").distinct().count()
    val (na, nn) = (exact("A"), exact("N"))
    assert(Sketches.kmvMinHashes(li.filter(col("l_returnflag") === "A"),
      "l_partkey", k).count() === k, "fixture assumption: saturated")
    assert(math.abs(r.getAs[Double]("est_a") - na) / na < 0.4)
    assert(math.abs(r.getAs[Double]("est_b") - nn) / nn < 0.4)
    assert(r.getAs[Double]("est_union") >=
      math.max(r.getAs[Double]("est_a"), r.getAs[Double]("est_b")) * 0.6)
  }

  // ---- Count-Min sketch --------------------------------------------------

  test("cms: never under-counts, and is exact for most of a small vocab") {
    val toks = Tables.documents(spark, SfDir)
      .select(explode(graft.functions.TextFunctions.tokens(col("text")))
        .as("tok"))
    val exact = toks.groupBy("tok").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val cells = Sketches.cmsCells(toks, "tok", 4, 64)
    val probes = exact.keys.toSeq.toDF("probe")
    val est = Sketches.cmsEstimate(cells, probes, 4, 64)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (t, n) =>
      assert(est(t) >= n, s"$t: CMS under-counted ${est(t)} < $n")
    }
    val nExact = exact.count { case (t, n) => est(t) == n }
    assert(nExact >= exact.size * 0.7,
      s"only $nExact/${exact.size} exact — w=64 should mostly avoid collisions")
  }

  test("cms: sketch relation is bounded by d*w, not by data size") {
    val toks = Tables.documents(spark, SfDir)
      .select(explode(graft.functions.TextFunctions.tokens(col("text")))
        .as("tok"))
    assert(Sketches.cmsCells(toks, "tok", 4, 64).count() <= 4L * 64)
  }
}
