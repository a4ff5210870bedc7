package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RanksSpec extends SparkSpec {
  import spark.implicits._

  test("globalRowNumber equals the single-window row_number") {
    val events = graft.Tables.events(spark, SfDir)
      .filter(col("user_id") < 20).select("event_id", "value")
    val fast = Ranks.globalRowNumber(events, "value", "event_id")
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSeq
    val slow = events.withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("value"), col("event_id"))).cast("long"))
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(fast == slow)
  }

  test("ranking plan has no corpus-wide window: every window " +
      "partitions by bucket or runs on the metadata grid") {
    val events = graft.Tables.events(spark, SfDir)
      .select("event_id", "value")
    val df = Ranks.globalRowNumber(events, "value", "event_id")
    // the local window is partitioned by __b; the only unpartitioned
    // window is the ≤1024-row grid prefix. Pin: the row-level window
    // node mentions the bucket column.
    val plan = df.queryExecution.optimizedPlan.toString
    val windows = plan.split("\n").filter(_.contains("windowspec"))
    assert(windows.exists(_.contains("__b")),
      s"local rank window must partition by bucket:\n$plan")
  }

  test("mannWhitney: identical groups give z ~ 0, shifted groups " +
      "a large |z|, matching a driver-side reference") {
    // group a ~ uniform, group b = a + shift
    val same = ((1 to 500).map(i => (i % 97 * 1.0, "a")) ++
      (1 to 500).map(i => (i % 97 * 1.0, "b"))).toDF("v", "g")
    val zSame = Ranks.mannWhitney(same, "v", "g", "a", "b")
      .head().getDouble(3)
    assert(math.abs(zSame) < 0.05, s"identical groups z=$zSame")

    val shifted = ((1 to 500).map(i => (i % 97 * 1.0, "a")) ++
      (1 to 500).map(i => (i % 97 * 1.0 + 50.0, "b"))).toDF("v", "g")
    val zShift = Ranks.mannWhitney(shifted, "v", "g", "a", "b")
      .head().getDouble(3)
    assert(zShift < -5.0, s"a below b must give strongly negative z, got $zShift")
  }

  test("spearman: monotone relation 1, reversed -1, independent ~0") {
    val mono = (1 to 200).map(i => (i.toDouble, i * i.toDouble))
      .toDF("x", "y")
    assert(Ranks.spearman(mono, "x", "y").head().getDouble(1) == 1.0)
    val rev = (1 to 200).map(i => (i.toDouble, -i.toDouble)).toDF("x", "y")
    assert(Ranks.spearman(rev, "x", "y").head().getDouble(1) == -1.0)
    val ind = (1 to 2000).map(i => (i.toDouble, (i * 7919 % 2003).toDouble))
      .toDF("x", "y")
    assert(math.abs(Ranks.spearman(ind, "x", "y").head().getDouble(1)) < 0.1)
  }

  test("spearman with ties matches the closed-form small case") {
    // x = (1,2,2,3), y = (10,20,20,40): tie-averaged ranks are
    // identical across both columns → rho = 1
    val df = Seq((1.0, 10.0), (2.0, 20.0), (2.0, 20.0), (3.0, 40.0))
      .toDF("x", "y")
    assert(Ranks.spearman(df, "x", "y").head().getDouble(1) == 1.0)
  }

  test("kappa: perfect agreement 1, chance-level 0, ppm-exact rates") {
    import graft.pipeline.WeakLabels
    val perfect = (1 to 100).map(i => (i % 3, i % 3)).toDF("a", "b")
    val kp = WeakLabels.kappa(perfect, col("a"), col("b")).head()
    assert(kp.getDouble(3) == 1.0)
    // b independent of a with identical marginals → kappa ≈ 0
    val chance = (0 until 900).map(i => (i % 3, (i / 3) % 3)).toDF("a", "b")
    val kc = WeakLabels.kappa(chance, col("a"), col("b")).head()
    assert(math.abs(kc.getDouble(3)) < 0.01, s"chance kappa ${kc.getDouble(3)}")
    // p_o/p_e are truncated-ppm ratios
    assert(kc.getDouble(1) == (300L * 1000000L / 900L).toDouble / 1e6)
  }

  test("mcnemar: symmetric disagreement gives chi2 = 0, one-sided " +
      "firing the hand value, no discordance a null") {
    import graft.pipeline.WeakLabels
    val sym = Seq((1, 1), (1, 0), (0, 1), (0, 0)).toDF("a", "b")
    val r0 = WeakLabels.mcnemar(sym, col("a"), col("b")).head()
    assert(r0.getLong(1) == 1L && r0.getLong(2) == 1L
      && r0.getDouble(3) == 0.0)
    val oneSided = Seq((1, 0), (1, 0), (1, 0), (0, 0)).toDF("a", "b")
    val r1 = WeakLabels.mcnemar(oneSided, col("a"), col("b")).head()
    assert(r1.getLong(1) == 3L && r1.getLong(2) == 0L
      && r1.getDouble(3) == 3.0) // (3-0)^2/3
    val agree = Seq((1, 1), (0, 0)).toDF("a", "b")
    assert(WeakLabels.mcnemar(agree, col("a"), col("b")).head()
      .isNullAt(3))
  }

  test("pageTrend: perfectly increasing blocks hit the hand z; the " +
      "reversed order negates it; all-ties give exactly +0.0") {
    // k = 3, n = 3, values rising along A < B < C: L = 42, μ = 36,
    // σ² = 6 → z = 6/√6 = 2.449490. Reversed: L = 30 → z = −2.449490.
    val up = (1L to 3L).flatMap(b =>
      Seq((b, "A", 10L + b), (b, "B", 20L + b), (b, "C", 30L + b)))
      .toDF("b", "t", "v")
    val r = Ranks.pageTrend(up, "b", "t", "v").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((3L, 3L, 84L)))
    assert(r.getDouble(3) == 2.449490, s"$r")
    val down = up.withColumn("v", lit(100L) - col("v"))
    val r2 = Ranks.pageTrend(down, "b", "t", "v").collect().head
    assert(r2.getLong(2) == 60L && r2.getDouble(3) == -2.449490, s"$r2")
    // flat: every block all-tied → L2 = 24n, z numerator exactly 0,
    // and the +0.0 normalizer pins the POSITIVE zero (the hash bit)
    val flat = (1L to 5L).flatMap(b =>
      Seq((b, "A", 7L), (b, "B", 7L), (b, "C", 7L))).toDF("b", "t", "v")
    val r3 = Ranks.pageTrend(flat, "b", "t", "v").collect().head
    assert(r3.getDouble(3) == 0.0 &&
      java.lang.Double.doubleToRawLongBits(r3.getDouble(3)) == 0L, s"$r3")
  }

  test("jonckheereTerpstra: k = 2 reduces to Mann–Whitney — hand U " +
      "and z, tie halves stay integer in U2, reversal negates") {
    // A = {1, 3}, B = {2, 4}: U = 3, U2 = 6; N = 4, Σn² = 8,
    // μ2 = 8, A = 16·11 − 2·(4·7) = 120 → z = (12−8)·3/√240
    val df = Seq(("a", 1.0), ("a", 3.0), ("b", 2.0), ("b", 4.0))
      .toDF("g", "v")
    val r = Ranks.jonckheereTerpstra(df, "g", "v").collect().head
    val expZ = BigDecimal(4.0 * 3.0 / math.sqrt(240.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((2L, 4L, 6L)))
    assert(r.getDouble(3) == expZ, s"$r vs $expZ")
    // with a cross-group tie: A = {1, 2}, B = {2, 3} → U = 3.5, U2 = 7
    val t = Ranks.jonckheereTerpstra(
      Seq(("a", 1.0), ("a", 2.0), ("b", 2.0), ("b", 3.0)).toDF("g", "v"),
      "g", "v").collect().head
    assert(t.getLong(2) == 7L, s"$t")
    // reversing the group order flips the trend's sign
    val rev = Ranks.jonckheereTerpstra(
      Seq(("b", 1.0), ("b", 3.0), ("a", 2.0), ("a", 4.0)).toDF("g", "v"),
      "g", "v").collect().head
    assert(rev.getDouble(3) == -expZ, s"$rev")
    // three increasing groups: strictly positive z; repartition-stable
    val up = Seq(("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0),
      ("c", 5.0), ("c", 6.0)).toDF("g", "v")
    val r3 = Ranks.jonckheereTerpstra(up, "g", "v").collect().head
    assert(r3.getLong(2) == 24L && r3.getDouble(3) > 2.0, s"$r3")
    val r3b = Ranks.jonckheereTerpstra(up.repartition(7), "g", "v")
      .collect().head
    assert(r3.toSeq == r3b.toSeq)
  }

  test("jonckheereTerpstra: U2 equals the all-pairs brute force on a " +
      "dense deterministic fixture (many ties, many values)") {
    val rows = (0 until 240).map { i =>
      val g = i % 4
      (g.toLong, ((i * 13 + g * 7) % 37).toDouble / 2.0)
    }
    val u2Brute = (for {
      (ga, va) <- rows; (gb, vb) <- rows if ga < gb
    } yield if (va < vb) 2L else if (va == vb) 1L else 0L).sum
    val r = Ranks.jonckheereTerpstra(rows.toDF("g", "v"), "g", "v")
      .collect().head
    assert(r.getLong(2) == u2Brute, s"got ${r.getLong(2)}, want $u2Brute")
    val r2 = Ranks.jonckheereTerpstra(rows.toDF("g", "v"), "g", "v",
      nBuckets = 7).collect().head
    assert(r2.toSeq == r.toSeq, "bucket count must not change the stat")
  }

  test("cochranQ at k = 2 reduces exactly to McNemar's (b-c)²/(b+c); " +
      "a fully-concordant table yields null") {
    import graft.pipeline.WeakLabels
    // 10 blocks: 3× (1,0), 1× (0,1), 3× (1,1), 3× (0,0).
    // T = (6, 4), N = 10, Σu² = 3 + 1 + 12 = 16:
    // Q = (2·(36+16) − 100)/(20 − 16) = 4/4 = 1 = (3−1)²/(3+1).
    val pairs = Seq.fill(3)((1, 0)) ++ Seq((0, 1)) ++
      Seq.fill(3)((1, 1)) ++ Seq.fill(3)((0, 0))
    val cells = pairs.zipWithIndex.flatMap { case ((a, b), i) =>
      Seq((i.toLong, "A", a), (i.toLong, "B", b)) }.toDF("blk", "t", "x")
    val r = WeakLabels.cochranQ(cells, "blk", "t", col("x") === 1).head()
    assert((r.getLong(0), r.getLong(1), r.getDouble(2)) ==
      ((2L, 10L, 1.0)), s"$r")
    // all blocks concordant (all-0 or all-1) → zero denominator → null
    val conc = (0L until 4L).flatMap(i =>
      Seq((i, "A", (i % 2).toInt), (i, "B", (i % 2).toInt)))
      .toDF("blk", "t", "x")
    assert(WeakLabels.cochranQ(conc, "blk", "t", col("x") === 1)
      .head().isNullAt(2))
    // incomplete blocks drop: adding a one-judge block changes nothing
    val plus = cells.unionAll(Seq((99L, "A", 1)).toDF("blk", "t", "x"))
    val r2 = WeakLabels.cochranQ(plus, "blk", "t", col("x") === 1).head()
    assert(r2.toSeq == r.toSeq)
  }

  test("consistency: for exactly two groups, tie-corrected " +
      "Kruskal-Wallis H equals the Mann-Whitney z squared") {
    val df = (1 to 300).map(i =>
      (if (i % 2 == 0) "a" else "b",
        (i % 17) / 2.0 + (if (i % 2 == 0) 1.0 else 0.0)))
      .toDF("g", "v")
    val h = Ranks.kruskalWallis(df, "v", "g").head().getDouble(2)
    val z = Ranks.mannWhitney(df, "v", "g", "a", "b").head().getDouble(3)
    assert(math.abs(h - z * z) < 1e-3, s"H=$h z^2=${z * z}")
  }

  test("cramerVonMises: identical samples give T = 0; disjoint " +
      "supports the hand value 0.375") {
    val same = Seq((1.0, "a"), (2.0, "a"), (1.0, "b"), (2.0, "b"))
      .toDF("v", "g")
    assert(Ranks.cramerVonMises(same, "v", "g", "a", "b").head()
      .getDouble(2) == 0.0)
    // A={1,2}, B={3,4}: sum l*(cumA*m - cumB*n)^2 = 4+16+4+0 = 24,
    // T = 24 / (16*2*2) = 0.375
    val disj = Seq((1.0, "a"), (2.0, "a"), (3.0, "b"), (4.0, "b"))
      .toDF("v", "g")
    val r = Ranks.cramerVonMises(disj, "v", "g", "a", "b").head()
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L)
    assert(r.getDouble(2) == 0.375, s"$r")
  }

  test("mannWhitney tie handling matches the textbook small case") {
    // A = {1, 2, 2}, B = {2, 3}: ranks 1, avg(2,3,4)=3, 3, 3, 5
    // R_a = 1 + 3 + 3 = 7; U_a = 7 - 3*4/2 = 1
    val df = Seq((1.0, "a"), (2.0, "a"), (2.0, "a"), (2.0, "b"),
      (3.0, "b")).toDF("v", "g")
    val r = Ranks.mannWhitney(df, "v", "g", "a", "b").head()
    assert(r.getLong(0) == 3 && r.getLong(1) == 2)
    assert(r.getDouble(2) == 1.0, s"U_a = ${r.getDouble(2)}")
  }

  test("ksTest: identical samples D=0, disjoint samples D=1, and the " +
      "textbook interleaved case") {
    val same = ((1 to 100).map(i => (i.toDouble, "a")) ++
      (1 to 100).map(i => (i.toDouble, "b"))).toDF("v", "g")
    assert(Ranks.ksTest(same, "v", "g", "a", "b").head().getDouble(2) == 0.0)
    val disj = ((1 to 50).map(i => (i.toDouble, "a")) ++
      (1 to 50).map(i => (i + 100.0, "b"))).toDF("v", "g")
    assert(Ranks.ksTest(disj, "v", "g", "a", "b").head().getDouble(2) == 1.0)
    // A={1,3}, B={2,4}: ECDF diffs at steps 1,2,3,4 are .5,0,.5,0 → D=.5
    val il = Seq((1.0, "a"), (3.0, "a"), (2.0, "b"), (4.0, "b"))
      .toDF("v", "g")
    assert(Ranks.ksTest(il, "v", "g", "a", "b").head().getDouble(2) == 0.5)
  }

  test("auc: perfect separation 1, reversed 0, random ~0.5, " +
      "all-tied 0.5 exactly") {
    val perfect = ((1 to 50).map(i => (i + 100.0, true)) ++
      (1 to 50).map(i => (i.toDouble, false))).toDF("s", "y")
    assert(Ranks.auc(perfect, "s", col("y")).head().getDouble(2) == 1.0)
    assert(Ranks.auc(perfect.withColumn("s", -col("s")), "s", col("y"))
      .head().getDouble(2) == 0.0)
    val tied = ((1 to 40).map(_ => (7.0, true)) ++
      (1 to 60).map(_ => (7.0, false))).toDF("s", "y")
    assert(Ranks.auc(tied, "s", col("y")).head().getDouble(2) == 0.5)
    val rand = (1 to 2000).map(i =>
      ((i * 7919 % 2003).toDouble, i % 2 == 0)).toDF("s", "y")
    val a = Ranks.auc(rand, "s", col("y")).head().getDouble(2)
    assert(math.abs(a - 0.5) < 0.05, s"random auc $a")
  }

  test("gini: equal values 0ish, total concentration -> (n-1)/n") {
    val eq = (1 to 100).map(i => (i.toLong, 10.0)).toDF("id", "x")
    assert(math.abs(Ranks.gini(eq, "x", "id").head().getDouble(1)) < 1e-9)
    // one person owns everything: G = (n-1)/n = 0.9 for n=10
    val conc = ((1 to 9).map(i => (i.toLong, 0.0)) :+ (10L, 100.0))
      .toDF("id", "x")
    assert(Ranks.gini(conc, "x", "id").head().getDouble(1) == 0.9)
  }

  test("quantileDisc matches Spark's sort-based percentile_disc " +
      "(ceil(p*n) rank) per group on fixture data") {
    val ev = graft.Tables.events(spark, SfDir)
    val fast = Ranks.quantileDisc(ev, "event_type", "value",
        Seq(0.25, 0.5, 0.75))
      .orderBy("event_type", "p").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSeq
    val slow = ev.groupBy("event_type")
      .agg(expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY value)")
          .as("p25"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)")
          .as("p50"),
        expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY value)")
          .as("p75"))
      .collect().flatMap(r => Seq(
        (r.getString(0), 0.25, r.getDouble(1)),
        (r.getString(0), 0.5, r.getDouble(2)),
        (r.getString(0), 0.75, r.getDouble(3))))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(fast == slow)
  }

  test("quantileDisc at exact p*n integer boundaries: rank ceil(p*n) " +
      "(DuckDB quantile_disc parity)") {
    // n = 4 per group and p = 0.25/0.5/0.75 ⇒ p*n = 1, 2, 3 exactly:
    // the boundary where ceil(p*n) and floor(p*(n-1))+1 rules diverge.
    // DuckDB quantile_disc picks the ceil(p*n)-th value (1-indexed),
    // i.e. 10, 20, 30 — NOT 20, 30, 40.
    val df = Seq(("g", 10.0), ("g", 20.0), ("g", 30.0), ("g", 40.0))
      .toDF("grp", "v")
    val out = Ranks.quantileDisc(df, "grp", "v", Seq(0.25, 0.5, 0.75))
      .orderBy("p").collect().map(r => (r.getDouble(1), r.getDouble(2)))
    assert(out.toSeq == Seq((0.25, 10.0), (0.5, 20.0), (0.75, 30.0)))
    // and with duplicated values straddling the boundary (ties)
    val ties = Seq(1.0, 1.0, 2.0, 2.0, 2.0, 3.0).map(("t", _))
      .toDF("grp", "v")
    val o2 = Ranks.quantileDisc(ties, "grp", "v", Seq(0.5, 1.0 / 3))
      .orderBy("p").collect().map(r => (r.getDouble(1), r.getDouble(2)))
    // n=6: p=1/3 ⇒ rank 2 ⇒ 1.0; p=0.5 ⇒ rank 3 ⇒ 2.0
    assert(o2.toSeq == Seq((1.0 / 3, 1.0), (0.5, 2.0)))
  }

  test("quantileDisc plan: grid windows partition by (group, bucket), " +
      "never the group column alone") {
    val ev = graft.Tables.events(spark, SfDir)
    val plan = Ranks.quantileDisc(ev, "event_type", "value", Seq(0.5))
      .queryExecution.optimizedPlan.toString
    val rowWindows = plan.split("\n").filter(_.contains("windowspec"))
    assert(rowWindows.forall(w => !w.contains("windowspec(g#")
        || w.contains("__b")),
      s"row-level window must include the bucket key:\n$plan")
  }

  test("winsorizedMean: clamps exactly at the 1/16 and 15/16 discrete " +
      "quantiles and agrees with a local replay") {
    val vals = (1 to 32).map(_.toDouble) // per group: 1..32
    val df = vals.flatMap(v => Seq(("a", v), ("b", v * 10))).toDF("g", "v")
    val out = Ranks.winsorizedMean(df, "g", "v", 0.0625, 0.9375)
      .orderBy("g").collect()
    // ceil(1/16 * 32) = 2nd smallest; ceil(15/16 * 32) = 30th
    val a = out(0)
    assert(a.getDouble(2) == 2.0 && a.getDouble(3) == 30.0, s"$a")
    val clamped = vals.map(v => math.min(math.max(v, 2.0), 30.0))
    val expW = BigDecimal(clamped.sum / 32).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(a.getDouble(5) == expW, s"${a.getDouble(5)} vs $expW")
    val expR = BigDecimal(vals.sum / 32).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(a.getDouble(4) == expR)
    val b = out(1)
    assert(b.getDouble(2) == 20.0 && b.getDouble(3) == 300.0)
  }

  test("averagePrecision: perfect ranking gives AP = 1, inverted " +
      "ranking the textbook minimum, and it matches a local replay") {
    val perfect = (1 to 10).map(i => (i.toLong, 100.0 - i, i <= 3))
      .toDF("id", "score", "y")
    val r1 = Ranks.averagePrecision(perfect, "score", "id", col("y"))
      .collect().head
    assert(r1.getLong(0) == 10L && r1.getLong(1) == 3L
      && r1.getDouble(2) == 1.0, s"$r1")
    // positives at the very bottom: AP = (1/3)(1/8 + 2/9 + 3/10)
    val worst = (1 to 10).map(i => (i.toLong, 100.0 - i, i >= 8))
      .toDF("id", "score", "y")
    val r2 = Ranks.averagePrecision(worst, "score", "id", col("y"))
      .collect().head.getDouble(2)
    val exp = BigDecimal((1.0 / 8 + 2.0 / 9 + 3.0 / 10) / 3).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(r2 - exp) < 2e-6, s"$r2 vs $exp")
  }

  test("averagePrecision: score ties resolve by id — deterministic " +
      "under repartitioning") {
    val df = (1 to 200).map(i =>
      (i.toLong, (i % 5).toDouble, i % 3 == 0)).toDF("id", "score", "y")
    val a = Ranks.averagePrecision(df, "score", "id", col("y"))
      .collect().head.toSeq
    val b = Ranks.averagePrecision(df.repartition(11), "score", "id",
      col("y")).collect().head.toSeq
    assert(a == b)
  }

  test("winsorizedMean tames a heavy outlier the raw mean absorbs") {
    val df = ((1 to 99).map(i => ("g", i.toDouble % 10 + 1))
      :+ ("g", 1e6)).toDF("g", "v")
    val r = Ranks.winsorizedMean(df, "g", "v", 0.0625, 0.9375)
      .collect().head
    assert(r.getDouble(4) > 1000.0, "raw mean dominated by the outlier")
    assert(r.getDouble(5) < 20.0, s"winsorized mean ${r.getDouble(5)}")
  }

  test("kruskalWallis: hand-computed tie-free H for three separated " +
      "groups") {
    // A={1,2}, B={3,4}, C={5,6}: ranks 1..6, R=(3,7,11),
    // H = 12/42 * (4.5 + 24.5 + 60.5) - 21 = 4.571429 (no ties)
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0),
      ("c", 5.0), ("c", 6.0)).toDF("g", "v")
    val r = Ranks.kruskalWallis(df, "v", "g").collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 6L)
    val exp = BigDecimal(12.0 / 42.0 * 89.5 - 21.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(r.getDouble(2) - exp) < 1e-6, s"$r vs $exp")
  }

  test("kruskalWallis: identical group distributions give H = 0 " +
      "under the tie correction; partitioning-independent") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 1.0), ("b", 2.0))
      .toDF("g", "v")
    val r = Ranks.kruskalWallis(df, "v", "g").collect().head
    assert(r.getDouble(2) == 0.0, s"$r")
    val big = (1 to 400).map(i => (s"g${i % 3}", (i % 17) / 2.0))
      .toDF("g", "v")
    val a = Ranks.kruskalWallis(big, "v", "g").collect().head.toSeq
    val b = Ranks.kruskalWallis(big.repartition(13), "v", "g")
      .collect().head.toSeq
    assert(a == b)
  }

  test("friedman: textbook maximum — one treatment always ranks top " +
      "across 3 blocks gives Q = 6 at k = 3") {
    // ranks per block: A=1, B=2, C=3 → R = (3, 6, 9),
    // Q = 12/(3·3·4)·126 − 3·3·4 = 42 − 36 = 6 (the k=3 n=3 maximum)
    val cells = Seq(
      (1L, "A", 10L), (1L, "B", 20L), (1L, "C", 30L),
      (2L, "A", 11L), (2L, "B", 21L), (2L, "C", 31L),
      (3L, "A", 12L), (3L, "B", 22L), (3L, "C", 32L))
      .toDF("b", "t", "v")
    val r = Ranks.friedman(cells, "b", "t", "v").collect().head
    assert((r.getLong(0), r.getLong(1), r.getDouble(2)) == ((3L, 3L, 6.0)))
  }

  test("friedman: ties take average ranks; incomplete blocks drop") {
    // blocks 1, 2 rank A=1 B=2 C=3; block 3 has A = B (ranks 1.5, 1.5)
    // → doubled rank sums R2 = (7, 11, 18), ΣR2² = 494,
    // Q = (3·494 − 3·9·3·16)/36 = 186/36 = 5.166667 (micro-rounded).
    // Block 9 misses treatment C → dropped entirely.
    val cells = Seq(
      (1L, "A", 10L), (1L, "B", 20L), (1L, "C", 30L),
      (2L, "A", 11L), (2L, "B", 21L), (2L, "C", 31L),
      (3L, "A", 5L), (3L, "B", 5L), (3L, "C", 7L),
      (9L, "A", 1L), (9L, "B", 2L))
      .toDF("b", "t", "v")
    val r = Ranks.friedman(cells, "b", "t", "v").collect().head
    assert((r.getLong(0), r.getLong(1), r.getDouble(2)) ==
      ((3L, 3L, 5.166667)))
  }

  test("friedman: identical values in every block (all ties) gives " +
      "Q = 0 exactly; partitioning-independent") {
    val flat = (1L to 40L).flatMap(b =>
      Seq((b, "x", 7L), (b, "y", 7L), (b, "z", 7L))).toDF("b", "t", "v")
    val r = Ranks.friedman(flat, "b", "t", "v").collect().head
    assert((r.getLong(0), r.getLong(1), r.getDouble(2)) ==
      ((3L, 40L, 0.0)))
    val r2 = Ranks.friedman(flat.repartition(13), "b", "t", "v")
      .collect().head
    assert(r.toSeq == r2.toSeq)
  }
}
