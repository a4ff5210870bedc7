package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("kCore peels the textbook graph: a triangle with pendant " +
      "vertices keeps exactly the triangle at k=2") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), // triangle
      (3L, 4L), (4L, 5L) // pendant chain
    ).toDF("a", "b")
    val core = Graph.kCore(edges, 2, maxIters = 8)
      .orderBy("v").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(core.toSeq == Seq((1L, 2L), (2L, 2L), (3L, 2L)))
  }

  test("kCore: k above the densest core empties the graph") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("a", "b")
    assert(Graph.kCore(edges, 3, maxIters = 8).count() == 0)
  }

  test("kCore converges early: result is a fixpoint (running the peel " +
      "again changes nothing)") {
    val edges = Graph.basketEdges(
      graft.Tables.lineitem(spark, SfDir)
        .filter(col("l_orderkey") % 4 === 0),
      "l_orderkey", "l_partkey")
    val once = Graph.kCore(edges, 15, maxIters = 8)
    val verts = once.collect().map(_.getLong(0)).toSet
    // re-peel the surviving subgraph: every vertex must still be there
    val sub = edges.filter(col("a").isin(verts.toSeq: _*)
      && col("b").isin(verts.toSeq: _*))
    val again = Graph.kCore(sub, 15, maxIters = 8)
      .collect().map(_.getLong(0)).toSet
    assert(again == verts, "k-core must be a fixpoint of the peel")
  }

  test("labelPropagation: two disconnected triangles settle on their " +
      "min-label communities (deterministic sync rounds)") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L)).toDF("a", "b")
    val sizes = Graph.labelPropagation(edges, rounds = 4)
      .orderBy("label").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // round 1 moves every vertex to its min neighbour label, round 2
    // floods the component minimum, rounds 3-4 are stable
    assert(sizes == Seq((1L, 3L), (4L, 3L)))
  }

  test("labelPropagation is orientation- and duplicate-insensitive " +
      "(canonicalization pins the input contract)") {
    val e1 = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("a", "b")
    val e2 = Seq((2L, 1L), (3L, 2L), (1L, 3L), (3L, 1L)).toDF("a", "b")
    val r1 = Graph.labelPropagation(e1, 3).orderBy("label").collect().toSeq
    val r2 = Graph.labelPropagation(e2, 3).orderBy("label").collect().toSeq
    assert(r1.map(r => (r.getLong(0), r.getLong(1)))
      == r2.map(r => (r.getLong(0), r.getLong(1))))
  }

  test("modularity: two clean communities score high; the same graph " +
      "under a single label scores exactly 0") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), // triangle A
      (4L, 5L), (5L, 6L), (4L, 6L), // triangle B
      (3L, 4L) // one bridge
    ).toDF("a", "b")
    val good = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L),
      (6L, 4L)).toDF("v", "label")
    val q = Graph.modularity(edges, good).collect().head
    assert(q.getLong(0) == 7L && q.getLong(1) == 2L)
    // hand computation: m=7, intra A=B=3, degrees A={2,2,3} B same →
    // Q = 2*(3/7 - (7/14)^2) = 6/7 - 1/2
    val exp = BigDecimal(2 * (3.0 / 7.0 - 0.25)).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(q.getDouble(2) - exp) < 1e-6, s"$q vs $exp")
    val trivial = (1L to 6L).map(v => (v, 0L)).toDF("v", "label")
    assert(Graph.modularity(edges, trivial).collect().head
      .getDouble(2) == 0.0, "one community: Q must be exactly 0")
  }

  test("modularity of labelPropagation's own assignments is " +
      "non-negative on the fixture graph (communities beat random)") {
    val edges = Graph.basketEdges(
      graft.Tables.lineitem(spark, SfDir)
        .filter(col("l_orderkey") % 4 === 0), "l_orderkey", "l_partkey")
    val q = Graph.modularity(edges,
      Graph.labelPropagationAssignments(edges, 4)).collect().head
    assert(q.getDouble(2) >= 0.0, s"$q")
  }

  test("assortativity: a star is perfectly disassortative (r = -1)") {
    val edges = Seq((10L, 1L), (10L, 2L), (10L, 3L)).toDF("a", "b")
    val row = Graph.assortativity(edges).collect().head
    assert(row.getLong(0) == 3L)
    assert(row.getDouble(1) == -1.0)
  }

  test("assortativity: a clique has zero degree variance handled as " +
      "NaN/null rather than a wrong number") {
    // K3: every endpoint degree is 2 → denominator 0; ANSI double
    // division yields NULL/NaN semantics, never a fabricated r
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("a", "b")
    val row = Graph.assortativity(edges).collect().head
    assert(row.getLong(0) == 3L)
    assert(row.isNullAt(1) || row.getDouble(1).isNaN)
  }

  test("adamicAdar scores the open wedge: path u-w-v predicts (u,v) " +
      "with score 1/ln(deg w)") {
    // star around w=10 with 3 leaves → three candidate pairs, each
    // scored 1/ln(3); plus edge (1,2) already present is excluded
    val edges = Seq((10L, 1L), (10L, 2L), (10L, 3L), (1L, 2L))
      .toDF("a", "b")
    val r = Graph.adamicAdar(edges, topK = 10).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).toSeq
    val s3 = BigDecimal(1.0 / math.log(3.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // (1,3) and (2,3) share only w (deg 3); (1,2) is an edge → excluded
    assert(r.map(t => (t._1, t._2)).toSet == Set((1L, 3L), (2L, 3L)))
    assert(r.forall(_._3 == s3), s"scores $r")
  }

  test("adamicAdar never emits an existing edge and respects topK") {
    val edges = Graph.basketEdges(
      graft.Tables.lineitem(spark, SfDir)
        .filter(col("l_orderkey") % 4 === 0),
      "l_orderkey", "l_partkey").localCheckpoint(true)
    val top = Graph.adamicAdar(edges, topK = 5)
    val rows = top.collect()
    assert(rows.length == 5)
    val edgeSet = edges.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows.forall(r => !edgeSet.contains((r.getLong(0), r.getLong(1)))))
  }

  test("adamicAdar edgesCanonical=true matches the canon path exactly " +
      "(round-13 fused-deg + skip-canon optimization parity)") {
    // basketEdges output is canonical (a < b, distinct, loop-free) —
    // the q229 call shape. Full-result equality, not just topK.
    val edges = Graph.basketEdges(
      graft.Tables.lineitem(spark, SfDir)
        .filter(col("l_orderkey") % 4 === 0),
      "l_orderkey", "l_partkey").localCheckpoint(true)
    val k = 50
    val viaCanon = Graph.adamicAdar(edges, topK = k).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val direct = Graph.adamicAdar(edges, topK = k, edgesCanonical = true)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(viaCanon == direct)
  }

  test("adamicAdar fused deg equals an explicit deg-join replay " +
      "(cap binding drops a hub's wedges on both paths)") {
    // hub 100 has 4 neighbors; cap=3 nulls its list → its wedges
    // vanish entirely (not truncated) exactly like the old deg-join
    // path; the unc capped star w=10 keeps score 1/ln(3)
    val edges = Seq((10L, 1L), (10L, 2L), (10L, 3L),
      (100L, 21L), (100L, 22L), (100L, 23L), (100L, 24L)).toDF("a", "b")
    val r = Graph.adamicAdar(edges, topK = 100, cap = 3).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).toSet
    val s3 = BigDecimal(1.0 / math.log(3.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r == Set((1L, 2L, s3), (1L, 3L, s3), (2L, 3L, s3)),
      s"got $r")
  }

  test("bfsHopHistogram: path graph distances from one and two seeds; " +
      "vertices beyond maxHops are absent") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    def seeds(vs: Long*) = vs.toDF("v")
    val one = Graph.bfsHopHistogram(edges, seeds(1L), maxHops = 3)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(one == Seq((0, 1L), (1, 1L), (2, 1L), (3, 1L)),
      s"vertex 5 (dist 4) must be absent: $one")
    val two = Graph.bfsHopHistogram(edges, seeds(1L, 5L), maxHops = 3)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(two == Seq((0, 2L), (1, 2L), (2, 1L)), s"$two")
  }

  test("weightedBasketEdges counts co-baskets and prices links at " +
      "1e6 div n; cheapestPaths relaxes the cheaper 2-hop route") {
    val baskets = Seq((10L, 1L), (10L, 2L), (11L, 1L), (11L, 2L),
      (12L, 1L), (12L, 3L)).toDF("basket", "item")
    val ew = Graph.weightedBasketEdges(baskets, "basket", "item")
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    assert(ew((1L, 2L)) == ((2L, 500000L)))
    assert(ew((1L, 3L)) == ((1L, 1000000L)))
    val edges = Seq((1L, 2L, 10L), (2L, 3L, 10L), (1L, 3L, 25L))
      .toDF("a", "b", "cost")
    val one = Graph.cheapestPaths(edges, Seq(1L).toDF("v"),
      rounds = 1, topK = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(one == Seq((1L, 0L), (2L, 10L), (3L, 25L)), s"$one")
    val two = Graph.cheapestPaths(edges, Seq(1L).toDF("v"),
      rounds = 2, topK = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(two == Seq((1L, 0L), (2L, 10L), (3L, 20L)),
      s"round 2 must relax via 2: $two")
  }

  test("consistency: cheapestPaths with unit costs reproduces " +
      "bfsHopHistogram distances exactly") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (2L, 5L), (5L, 6L))
      .toDF("a", "b")
    val unit = edges.withColumn("cost", lit(1L))
    val byCost = Graph.cheapestPaths(unit, Seq(1L).toDF("v"),
      rounds = 4, topK = 100).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val byHops = Graph.bfsHopHistogram(edges, Seq(1L).toDF("v"), 4)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    val costHist = byCost.values.groupBy(identity)
      .map { case (c, vs) => (c.toInt, vs.size.toLong) }
    assert(costHist == byHops, s"$costHist vs $byHops")
  }

  test("pathCentrality: path graph — hand-counted sigma·suffix traffic " +
      "from one pivot") {
    // 1-2-3-4: pivot 1, 3 hops. sigma = 1 everywhere; suffix counts
    // g(4)=1, g(3)=2, g(2)=3 → traffic v2=3, v3=2, v4=1.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val t = Graph.pathCentrality(edges, Seq(1L).toDF("v"),
        maxHops = 3, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(t == Seq((2L, 3L), (3L, 2L), (4L, 1L)), s"$t")
  }

  test("pathCentrality: diamond — sigma sums over BFS-DAG " +
      "predecessors, both middles carry equal traffic") {
    // 1-2, 1-3, 2-4, 3-4: pivot 1, 2 hops. sigma(4)=2 (two shortest
    // paths), g(2)=g(3)=2 (self + suffix to 4) → traffic
    // v2 = v3 = 1·2 = 2, v4 = 2·1 = 2.
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L)).toDF("a", "b")
    val t = Graph.pathCentrality(edges, Seq(1L).toDF("v"),
        maxHops = 2, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(t == Seq((2L, 2L), (3L, 2L), (4L, 2L)), s"$t")
  }

  test("pathCentrality: multiple pivots sum; pivot rows themselves are " +
      "excluded; maxHops truncates identically to a shorter unroll") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    // pivots 1 and 5 on the path: by symmetry every interior vertex
    // gets traffic from both ends. From 1 (3 hops): v2=3,v3=2,v4=1.
    // From 5 (3 hops): v4=3,v3=2,v2=1. Totals: v2=4,v3=4,v4=4,
    // v1(from 5, dist 4) absent, v5(from 1) absent.
    val t = Graph.pathCentrality(edges, Seq(1L, 5L).toDF("v"),
        maxHops = 3, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(t == Seq((2L, 4L), (3L, 4L), (4L, 4L)), s"$t")
    // maxHops = 1: only direct neighbours, traffic = 1 each side
    val t1 = Graph.pathCentrality(edges, Seq(1L, 5L).toDF("v"),
        maxHops = 1, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(t1 == Seq((2L, 1L), (4L, 1L)), s"$t1")
  }

  test("bfsHopHistogram: a seed absent from the graph still counts " +
      "at distance 0; orientation of edges is irrelevant") {
    val edges = Seq((2L, 1L), (1L, 2L), (3L, 2L)).toDF("a", "b")
    val h = Graph.bfsHopHistogram(edges, Seq(99L).toDF("v"), 2)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(h == Seq((0, 1L)))
    val h2 = Graph.bfsHopHistogram(edges, Seq(3L).toDF("v"), 2)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(h2 == Seq((0, 1L), (1, 1L), (2, 1L)))
  }
}
