package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CausalSpec extends SparkSpec {
  import spark.implicits._

  test("stratifiedEffect: hand-computed strata and ATE") {
    // stratum A: treat {10, 12} control {8}; stratum B: treat {3}
    // control {1, 1}. diffs: A = 11-8 = 3, B = 3-1 = 2.
    // ATE = (3/6)*3 + (3/6)*2 = 2.5
    val df = Seq(
      ("A", 0L, 10.0), ("A", 2L, 12.0), ("A", 1L, 8.0),
      ("B", 4L, 3.0), ("B", 3L, 1.0), ("B", 5L, 1.0)
    ).toDF("s", "uid", "y")
    val out = Causal.stratifiedEffect(df, "s", col("uid") % 2 === 0, "y")
      .orderBy("stratum").collect()
    val byName = out.map(r => r.getString(0) -> r).toMap
    val ate = byName("__ate")
    assert(ate.getLong(1) == 6L && ate.getLong(2) == 3L
      && ate.getDouble(5) == 2.5, s"${out.toSeq}")
    val a = byName("A")
    assert(a.getDouble(3) == 11.0
      && a.getDouble(4) == 8.0 && a.getDouble(5) == 3.0)
    assert(byName("B").getDouble(5) == 2.0)
  }

  test("cemAtt: common-support pruning and hand-computed weighted ATT") {
    // cell (0,0): T {10, 14} m=12, C {8} m=8 → diff 4, weight 2
    // cell (1,0): T {20},     C {10, 14} m=12 → diff 8, weight 1
    // cell (2,0): T {99} only — OUTSIDE common support, pruned
    // cell (0,1): C {5} only — pruned
    // ATT = (2·4 + 1·8) / 3 = 16/3; naive uses ALL units
    val df = Seq(
      (0L, 0L, true, 10.0), (0L, 0L, true, 14.0), (0L, 0L, false, 8.0),
      (1L, 0L, true, 20.0), (1L, 0L, false, 10.0), (1L, 0L, false, 14.0),
      (2L, 0L, true, 99.0), (0L, 1L, false, 5.0)
    ).toDF("c1", "c2", "t", "y")
    val out = Causal.cemAtt(df, col("t"), "y", col("c1"), col("c2"))
      .collect().head
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert((out.getLong(0), out.getLong(1), out.getLong(2))
      == ((4L, 3L, 2L)), s"$out")
    assert(out.getDouble(3) == r6(16.0 / 3.0), s"$out")
    // naive: mean(T) - mean(C) over everyone incl. pruned units
    val naive = (10.0 + 14.0 + 20.0 + 99.0) / 4.0 -
      (8.0 + 10.0 + 14.0 + 5.0) / 4.0
    assert(out.getDouble(4) == r6(naive), s"$out")
  }

  test("diffInDiffs: hand-computed 2x2 cells, SE, and t") {
    // T-pre {10,12} m=11 s2=2; T-post {20,26} m=23 s2=18;
    // C-pre {1,3} m=2 s2=2; C-post {5,7} m=6 s2=2.
    // DiD = (23-11) - (6-2) = 8; SE = sqrt(18/2 + 2/2 + 2/2 + 2/2)
    // = sqrt(12); t = 8/sqrt(12)
    val df = Seq(
      (true, false, 10.0), (true, false, 12.0),
      (true, true, 20.0), (true, true, 26.0),
      (false, false, 1.0), (false, false, 3.0),
      (false, true, 5.0), (false, true, 7.0)
    ).toDF("t", "p", "y")
    val out = Causal.diffInDiffs(df, col("t"), col("p"), "y")
      .collect().head
    assert((out.getLong(0), out.getLong(1), out.getLong(2),
      out.getLong(3)) == ((2L, 2L, 2L, 2L)), s"$out")
    assert(out.getDouble(4) == 8.0, s"$out")
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.getDouble(5) == r6(math.sqrt(12.0)), s"$out")
    assert(out.getDouble(6) == r6(8.0 / math.sqrt(12.0)), s"$out")
  }

  test("stratifiedEffect undoes Simpson's paradox: raw pooled diff has " +
      "the opposite sign of every within-stratum diff") {
    // classic construction: treatment concentrates in the low-outcome
    // stratum, so the POOLED treated mean is lower even though
    // treatment helps within each stratum
    val rows =
      Seq.fill(8)(("low", 0L, 2.0)) ++ Seq.fill(2)(("low", 1L, 1.0)) ++
      Seq.fill(2)(("high", 0L, 11.0)) ++ Seq.fill(8)(("high", 1L, 10.0))
    val df = rows.toDF("s", "uid", "y")
    val treat = col("uid") % 2 === 0
    // pooled (unstratified) diff: treated mean < control mean
    val pooled = df.groupBy(treat.as("t"))
      .agg(avg("y").as("m")).collect()
      .map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(pooled(true) < pooled(false))
    // stratified ATE is positive (+1 in each stratum)
    val ate = Causal.stratifiedEffect(df, "s", treat, "y")
      .filter(col("stratum") === "__ate").collect().head.getDouble(5)
    assert(ate == 1.0, s"ate=$ate")
  }

  test("stratifiedEffect: a stratum with an empty arm reports null " +
      "diff and is excluded from the ATE weighting") {
    val df = Seq(
      ("A", 0L, 10.0), ("A", 1L, 8.0),
      ("C", 1L, 100.0) // control-only stratum: unidentified
    ).toDF("s", "uid", "y")
    val out = Causal.stratifiedEffect(df, "s", col("uid") % 2 === 0, "y")
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(5)) None else Some(r.getDouble(5)))).toMap
    assert(out("C").isEmpty)
    assert(out("__ate").contains(2.0)) // only A identifies: 10-8
  }

  test("cmhTest: no association in either stratum gives CMH = 0; " +
      "perfect association gives the hand-computed statistic") {
    // each stratum: (T,Y),(T,N),(C,Y),(C,N) -> a = 1 = E, V = 1/3
    val indep = Seq(
      ("s1", true, true), ("s1", true, false),
      ("s1", false, true), ("s1", false, false),
      ("s2", true, true), ("s2", true, false),
      ("s2", false, true), ("s2", false, false))
      .toDF("s", "t", "y")
    val r0 = Causal.cmhTest(indep, "s", col("t"), col("y"))
      .collect().head
    assert(r0.getLong(0) == 2L && r0.getLong(1) == 8L)
    assert(r0.getDouble(4) == 0.0, s"$r0")
    // perfect: (T,Y),(T,Y),(C,N),(C,N) per stratum -> a=2, E=1, V=1/3
    // CMH = (4-2)^2 / (2/3) = 6
    val perfect = Seq(
      ("s1", true, true), ("s1", true, true),
      ("s1", false, false), ("s1", false, false),
      ("s2", true, true), ("s2", true, true),
      ("s2", false, false), ("s2", false, false))
      .toDF("s", "t", "y")
    val r1 = Causal.cmhTest(perfect, "s", col("t"), col("y"))
      .collect().head
    assert(r1.getLong(2) == 4L && r1.getDouble(3) == 2.0)
    assert(r1.getDouble(4) == 6.0, s"$r1")
  }

  test("ipwAte: under confounded assignment (treatment probability " +
      "rising with the confounder, zero true effect) the IPW estimate " +
      "shrinks the naive bias; deterministic under repartitioning") {
    // levels l = 0..7: fraction (l+1)/8 treated, y = 10*l, effect 0
    val units = for {
      rep <- 0 until 3; l <- 0 until 8; j <- 0 until 8
    } yield (if (j <= l) 1.0 else 0.0, 10.0 * l, l / 4.0, (j % 4) / 4.0)
    val df = units.toDF("t", "y", "x1", "x2")
    val r = Causal.ipwAte(df, "t", "y", "x1", "x2").collect().head
    val naive = r.getDouble(5); val ipw = r.getDouble(6)
    assert(naive > 5.0, s"fixture must be confounded: naive=$naive")
    assert(math.abs(ipw) < math.abs(naive),
      s"IPW must shrink the bias: naive=$naive ipw=$ipw")
    val r2 = Causal.ipwAte(df.repartition(13), "t", "y", "x1", "x2")
      .collect().head
    assert(r.toSeq == r2.toSeq)
  }

  test("cmhTest: a degenerate stratum (everyone treated) contributes " +
      "nothing rather than NaN") {
    val df = Seq(
      ("ok", true, true), ("ok", true, true),
      ("ok", false, false), ("ok", false, false),
      ("deg", true, true), ("deg", true, false))
      .toDF("s", "t", "y")
    val r = Causal.cmhTest(df, "s", col("t"), col("y")).collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 6L)
    // only 'ok' contributes: a=2, E=1, V=1/3 -> CMH = 1/(1/3) = 3
    assert(r.getLong(2) == 2L && r.getDouble(3) == 1.0)
    assert(r.getDouble(4) == 3.0, s"$r")
  }
}
