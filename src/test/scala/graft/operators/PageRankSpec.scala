package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private def sym(pairs: (Long, Long)*) =
    (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")

  test("symmetric triangle: ranks stay uniform at 1/3") {
    val r = PageRank.run(sym((1L, 2L), (2L, 3L), (1L, 3L)), 5, 0.85)
      .collect().map(x => (x.getLong(0), x.getDouble(1))).toMap
    assert(r.keySet == Set(1L, 2L, 3L))
    r.values.foreach(v => assert(math.abs(v - 1.0 / 3.0) < 1e-9, s"$r"))
  }

  test("star: the hub out-ranks every leaf and mass is conserved") {
    val r = PageRank.run(sym((10L, 1L), (10L, 2L), (10L, 3L), (10L, 4L)),
      5, 0.85).collect().map(x => (x.getLong(0), x.getDouble(1))).toMap
    val hub = r(10L)
    (1L to 4L).foreach(l => assert(hub > r(l), s"$r"))
    // damped PR on a graph with no dangling nodes preserves total mass
    assert(math.abs(r.values.sum - 1.0) < 1e-6, s"sum=${r.values.sum}")
  }

  test("personalized: mass concentrates around the seed; a component " +
      "with no seed stays at exactly zero") {
    import org.apache.spark.sql.Row
    // two disconnected triangles; seed node 1 in the first
    val edges = sym((1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L))
    val seeds = Seq(Tuple1(1L)).toDF("node")
    val r = PageRank.personalized(edges, seeds, 5, 0.85)
      .collect().map(x => (x.getLong(0), x.getDouble(1))).toMap
    assert(r(1L) > r(2L) && r(2L) == r(3L), s"$r")
    Seq(10L, 11L, 12L).foreach(n =>
      assert(r(n) == 0.0, s"unseeded component leaked mass: $r"))
    assert(math.abs(r.values.sum - 1.0) < 1e-6)
  }

  test("personalized with ALL nodes as seeds equals plain PageRank") {
    val edges = sym((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
    val all = edges.select(col("src").as("node")).distinct()
    val p = PageRank.personalized(edges, all, 4, 0.85)
      .collect().map(x => (x.getLong(0), x.getDouble(1))).toMap
    val plain = PageRank.run(edges, 4, 0.85)
      .collect().map(x => (x.getLong(0), x.getDouble(1))).toMap
    assert(p == plain, s"$p vs $plain")
  }

  test("hits: the authority everyone points at dominates; scores are " +
      "a distribution (sum 1) and symmetric structures tie") {
    val edges = Seq((1L, 100L), (2L, 100L), (3L, 100L),
      (1L, 200L), (2L, 300L)).toDF("hub", "auth")
    val a = PageRank.hits(edges, 3).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(a(100L) > a(200L) && a(100L) > a(300L), s"$a")
    assert(math.abs(a.values.sum - 1.0) < 1e-6)
    assert(a(200L) == a(300L), s"symmetric authorities must tie: $a")
  }

  test("hits is deterministic under repartitioning") {
    val e = graft.Tables.lineitem(spark, SfDir)
      .filter(col("l_orderkey") % 4 === 0)
      .select(col("l_orderkey").as("hub"), col("l_partkey").as("auth"))
    val a = PageRank.hits(e, 2).orderBy("node").collect().map(_.toSeq).toSeq
    val b = PageRank.hits(e.repartition(9), 2).orderBy("node")
      .collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("one iteration matches the hand-computed damped update") {
    // path 1-2-3 symmetrized: deg(1)=deg(3)=1, deg(2)=2; from uniform
    // r=1/3: node1 gets r2/2, node2 gets r1+r3, node3 gets r2/2
    val r = PageRank.run(sym((1L, 2L), (2L, 3L)), 1, 0.85)
      .collect().map(x => (x.getLong(0), x.getDouble(1))).toMap
    def fx(x: Double) = BigDecimal(x)
      .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    val third = fx(1.0 / 3.0)
    val half = fx(third / 2.0)
    val exp1 = fx(0.15 / 3.0 + 0.85 * half)
    val exp2 = fx(0.15 / 3.0 + 0.85 * (third + third))
    assert(r(1L) == BigDecimal(exp1).setScale(9,
      BigDecimal.RoundingMode.HALF_UP).toDouble, s"$r")
    assert(r(2L) == BigDecimal(exp2).setScale(9,
      BigDecimal.RoundingMode.HALF_UP).toDouble, s"$r")
    assert(r(1L) == r(3L))
  }

  test("runWeighted with uniform weights is bit-identical to run; " +
      "skewed weights pull rank toward the heavy edge's endpoint") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L), (4L, 1L))
    val sym = (pairs ++ pairs.map(p => (p._2, p._1))).distinct
    // uniform w = 7: contribution rank·7/(7·deg) = rank/deg exactly
    val uw = sym.map { case (s, d) => (s, d, 7L) }.toDF("src", "dst", "w")
    val a = PageRank.runWeighted(uw, iters = 4, damping = 0.85)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val b = PageRank.run(sym.toDF("src", "dst"), iters = 4,
      damping = 0.85)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(a == b, s"uniform weights must reduce to the unweighted\n$a\n$b")
    // triangle 1-2-3 with one heavy edge 2→3: node 3 must outrank its
    // uniform-weight score (it now receives most of 2's mass)
    val tri = Seq((1L, 2L, 1L), (2L, 1L, 1L), (2L, 3L, 99L),
      (3L, 2L, 1L), (3L, 1L, 1L), (1L, 3L, 1L))
      .toDF("src", "dst", "w")
    val w = PageRank.runWeighted(tri, iters = 6, damping = 0.85)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(w(3L) > w(1L) && w(3L) > w(2L),
      s"the heavy in-edge must dominate: $w")
    // empty weighted graph → empty frame (the run() discipline)
    val none = Seq.empty[(Long, Long, Long)].toDF("src", "dst", "w")
    assert(PageRank.runWeighted(none, 3, 0.85).count() == 0)
  }

  test("empty edge relation: run and hits return empty frames (the " +
      "SQL answer), personalized fails its seed contract loudly — " +
      "never an ANSI division or null-accessor error") {
    val none = Seq.empty[(Long, Long)].toDF("src", "dst")
    val pr = PageRank.run(none, iters = 3, damping = 0.85)
    assert(pr.columns.toSeq == Seq("node", "rank") && pr.count() == 0)
    val ht = PageRank.hits(
      Seq.empty[(Long, Long)].toDF("hub", "auth"), iters = 2)
    assert(ht.columns.toSeq == Seq("node", "auth") && ht.count() == 0)
    val ex = intercept[IllegalArgumentException] {
      PageRank.personalized(none, Seq(1L).toDF("node"),
        iters = 2, damping = 0.85).collect()
    }
    assert(ex.getMessage.contains("at least one seed"), ex.getMessage)
  }
}
