package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def series(vals: Seq[Double]) =
    vals.zipWithIndex.map { case (v, i) =>
      (java.sql.Timestamp.valueOf(java.time.LocalDate.of(2024, 1, 1)
        .plusDays(i).atTime(10, 30)), v)
    }.toDF("ts", "v")

  /** Local replica of the estimator including the integer term
    * rounding, so the assertion pins the exact published definition. */
  private def localAcf(vals: Seq[Double], lags: Range): Map[Int, Double] = {
    val mu = vals.sum / vals.size
    val c = vals.map(_ - mu)
    def rint(x: Double) = BigDecimal(x)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble
    val den = c.map(x => rint(x * x)).sum
    lags.map { l =>
      val num = c.dropRight(l).zip(c.drop(l)).map { case (a, b) =>
        rint(a * b) }.sum
      l -> BigDecimal(num / den)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
  }

  test("dailyAcf matches a direct computation of the estimator") {
    val vals = Seq(110.0, 230.0, 150.0, 310.0, 170.0, 390.0, 130.0,
      270.0, 190.0, 350.0)
    val out = TimeSeries.dailyAcf(series(vals), "ts", "v", 3)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    val exp = localAcf(vals, 1 to 3)
    assert(out.map(_._1).toSeq == Seq(1, 2, 3))
    out.foreach { case (l, n, a) =>
      assert(n == vals.size - l, s"lag $l pairs $n")
      assert(a == exp(l), s"lag $l: $a vs ${exp(l)}")
    }
  }

  test("dailyAcf: alternating series is negatively correlated at lag 1, " +
      "positively at lag 2") {
    val vals = Seq.tabulate(14)(i => if (i % 2 == 0) 100.0 else 500.0)
    val out = TimeSeries.dailyAcf(series(vals), "ts", "v", 2)
      .collect().map(r => (r.getInt(0), r.getDouble(2))).toMap
    assert(out(1) < -0.8, s"$out")
    assert(out(2) > 0.8, s"$out")
  }

  test("seasonalIndex: a flat series indexes every weekday at exactly " +
      "1.0, and the dow mapping starts at Sunday = 0") {
    val flat = series(Seq.fill(14)(250.0))
    val out = TimeSeries.seasonalIndex(flat, "ts", "v")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(3)))
    assert(out.length == 7)
    assert(out.forall(_._2 == 2L)) // 14 days → each dow twice
    assert(out.forall(_._3 == 1.0), s"${out.toSeq}")
    // 2024-01-01 is a Monday → dow 1 must exist and carry the Jan 1 row
    assert(out.map(_._1).toSeq == (0 to 6))
  }

  test("seasonalIndex: doubling one weekday's revenue moves only that " +
      "index up, others equally down") {
    // 14 days, Mondays (dow 1: Jan 1, Jan 8) at 500, others 250
    val vals = Seq.tabulate(14)(i => if (i % 7 == 0) 500.0 else 250.0)
    val out = TimeSeries.seasonalIndex(series(vals), "ts", "v")
      .collect().map(r => (r.getInt(0), r.getDouble(3))).toMap
    assert(out(1) > 1.5, s"$out")
    val others = out.filter(_._1 != 1).values.toSeq
    assert(others.forall(v => v < 1.0 && v == others.head), s"$out")
  }

  test("forecastBacktest: a perfectly weekly series gives seasonal7 " +
      "zero error while naive1 pays for every day-over-day jump") {
    val vals = Seq.tabulate(28)(i => 100.0 + 50.0 * (i % 7))
    val out = TimeSeries.forecastBacktest(series(vals), "ts", "v")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val s7 = out("seasonal7")
    assert(s7._1 == 21L && s7._2 == 0.0 && s7._3 == 0.0, s"$out")
    val n1 = out("naive1")
    assert(n1._1 == 27L && n1._2 > 0.1 && n1._3 > 10.0, s"$out")
  }

  test("forecastBacktest: a random-walk-ish series favors naive1 over " +
      "seasonal7 — the comparison discriminates") {
    val vals = Seq.iterate(200.0, 30)(x => x + 10.0)
    val out = TimeSeries.forecastBacktest(series(vals), "ts", "v")
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(out("naive1") < out("seasonal7"), s"$out")
    assert(out("naive1") == 10.0) // constant +10 drift: rmse exactly 10
  }

  test("cusumDaily pinpoints an injected level shift at its last " +
      "pre-shift day and clears the 5% Kolmogorov bar") {
    // 10 days at 100, then 10 days at 300 → |cusum| peaks at day 10
    val vals = Seq.fill(10)(100.0) ++ Seq.fill(10)(300.0)
    val r = TimeSeries.cusumDaily(series(vals), "ts", "v")
      .collect().head
    assert(r.getLong(0) == 20L)
    assert(r.getTimestamp(1).toString.startsWith("2024-01-10"), s"$r")
    assert(math.abs(r.getDouble(2)) == 1000.0, s"peak ${r.getDouble(2)}")
    assert(r.getDouble(3) > 1.36, s"stat ${r.getDouble(3)}")
  }

  test("cusumDaily: a trendless stable series stays under the bar, " +
      "and a constant series reports null (undefined), not an error") {
    val stable = Seq.tabulate(40)(i =>
      200.0 + (if (i % 2 == 0) 3.0 else -3.0))
    val r = TimeSeries.cusumDaily(series(stable), "ts", "v")
      .collect().head
    assert(r.getDouble(3) < 1.36, s"stat ${r.getDouble(3)}")
    val const = TimeSeries.cusumDaily(series(Seq.fill(10)(50.0)),
      "ts", "v").collect().head
    assert(const.isNullAt(3))
  }

  test("theilSenDaily: exact slope and intercept on a clean line") {
    // x_t = 100 + 5*t for 12 days; slope 5, intercept = 100 - 5*t0
    // with t = days since epoch
    val df = series((0 until 12).map(i => 100.0 + 5.0 * i))
    val r = TimeSeries.theilSenDaily(df, "ts", "v").collect().head
    assert(r.getLong(0) == 12L && r.getLong(1) == 66L, s"$r")
    assert(r.getDouble(2) == 5.0)
    val t0 = java.time.LocalDate.of(2024, 1, 1).toEpochDay.toDouble
    assert(r.getDouble(3) == 100.0 - 5.0 * t0, s"$r")
  }

  test("theilSenDaily: driver fast path is bit-equal to the " +
      "distributed quantile machinery") {
    // jagged series (ties, negatives, an outlier) across both paths
    val vals = Seq(10.0, -3.5, 10.0, 88.8, 0.0, 7.25, -3.5, 42.0,
      13.13, 99.9, 7.25, 1e5, 6.0, 6.0, -77.0)
    val df = series(vals)
    val fast = TimeSeries.theilSenDaily(df, "ts", "v").collect().head
    val dist = TimeSeries.theilSenDaily(df, "ts", "v",
      driverDaysUpTo = 0).collect().head
    assert(fast == dist, s"fast=$fast dist=$dist")
  }

  test("theilSenDaily: fewer than 2 observation days yields the empty " +
      "frame on BOTH paths (no pairs, medians undefined)") {
    for (vals <- Seq(Seq.empty[Double], Seq(42.0))) {
      val df = series(vals)
      assert(TimeSeries.theilSenDaily(df, "ts", "v").count() == 0L,
        s"fast path, ${vals.length} days")
      assert(TimeSeries.theilSenDaily(df, "ts", "v", driverDaysUpTo = 0)
        .count() == 0L, s"distributed path, ${vals.length} days")
    }
  }

  test("theilSenDaily shrugs off an outlier day that wrecks OLS") {
    // clean slope 2 with one corrupted day (value 1e6)
    val vals = (0 until 15).map(i => 50.0 + 2.0 * i)
      .updated(7, 1e6)
    val r = TimeSeries.theilSenDaily(series(vals), "ts", "v")
      .collect().head
    assert(math.abs(r.getDouble(2) - 2.0) < 0.2,
      s"robust slope ${r.getDouble(2)}")
  }

  test("dailyAcf aggregates intra-day rows to the daily grid first") {
    // two rows per day summing to the single-row series above
    val half = Seq(55.0, 115.0, 75.0, 155.0)
    val df = half.zipWithIndex.flatMap { case (v, i) =>
      Seq((java.sql.Timestamp.valueOf(f"2024-01-${i + 1}%02d 01:00:00"), v),
        (java.sql.Timestamp.valueOf(f"2024-01-${i + 1}%02d 23:00:00"), v))
    }.toDF("ts", "v")
    val a = TimeSeries.dailyAcf(df, "ts", "v", 1).collect()
    val b = TimeSeries.dailyAcf(series(half.map(_ * 2)), "ts", "v", 1)
      .collect()
    assert(a.map(_.getDouble(2)).toSeq == b.map(_.getDouble(2)).toSeq)
  }

  test("ewmaControl: hand-replayed floor-halving recurrence in cents " +
      "and a spike alarm") {
    // 100, 200, 100 -> e = 100, 150, 125 (integer cents, exact)
    val df = series(Seq(100.0, 200.0, 100.0))
    val out = TimeSeries.ewmaControl(df, "ts", "v", l = 100.0)
      .collect().map(r => (r.getDouble(2), r.getBoolean(3)))
    assert(out.map(_._1).toSeq == Seq(100.0, 150.0, 125.0), s"${out.toSeq}")
    assert(out.forall(!_._2), "l = 100 sigma must never alarm")
    // a flat series with one huge spike: only the spike day alarms
    val spiky = series(Seq.fill(10)(100.0) ++ Seq(10000.0)
      ++ Seq.fill(10)(100.0))
    val alarms = TimeSeries.ewmaControl(spiky, "ts", "v", l = 2.0)
      .collect().map(r => (r.getDouble(1), r.getBoolean(3)))
    assert(alarms.count(_._2) >= 1)
    assert(alarms.filter(_._2).exists(_._1 == 10000.0),
      "the spike day must alarm")
  }

  test("ewmaControl: day 1 never alarms and the floor keeps every " +
      "state an exact integer in cents (odd sums truncate)") {
    // 1.01 then 1.02: e2 = (101 + 102) div 2 = 101 cents = 1.01
    val df = series(Seq(1.01, 1.02))
    val out = TimeSeries.ewmaControl(df, "ts", "v", l = 0.0)
      .collect().map(r => (r.getDouble(2), r.getBoolean(3)))
    assert(out.head._1 == 1.01 && !out.head._2)
    assert(out(1)._1 == 1.01, s"${out.toSeq}")
  }

  test("holtBacktest: hand-replayed two-state integer recurrence on " +
      "a 4-day ramp; naive matches the constant step") {
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val hv = TimeSeries.holtBacktest(
      series(Seq(100.0, 110.0, 120.0, 130.0)), "ts", "v").collect()
    val holt = hv.find(_.getString(0) == "holt").get
    val naive = hv.find(_.getString(0) == "naive1").get
    // hand: l,b = (10000,0)->(10500,250)->(11375,562); errors in
    // cents: 1000, 1250, 1063
    val errs = Seq(1000.0, 1250.0, 1063.0)
    assert(holt.getLong(1) == 3L)
    assert(holt.getDouble(2) == r6(errs.sum / 100.0 / 3.0), s"$holt")
    assert(holt.getDouble(3) ==
      r6(math.sqrt(errs.map(e => e * e).sum / 10000.0 / 3.0)), s"$holt")
    assert(naive.getDouble(2) == 10.0 && naive.getDouble(3) == 10.0)
  }

  test("holtBacktest: on a long pure ramp the trend model beats " +
      "naive carryover") {
    val ramp = (0 until 40).map(i => 100.0 + 10.0 * i)
    val out = TimeSeries.holtBacktest(series(ramp), "ts", "v")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(out("holt") < out("naive1"),
      s"holt ${out("holt")} vs naive ${out("naive1")}")
  }

  test("bollingerDaily: only full 7-day windows emit; a flat series " +
      "has sd 0 and no breach; a spike day breaches") {
    val flat = TimeSeries.bollingerDaily(series(Seq.fill(9)(50.0)),
      "ts", "v").collect()
    assert(flat.length == 3) // days 7, 8, 9
    assert(flat.forall(r => r.getDouble(2) == 50.0
      && r.getDouble(3) == 0.0 && !r.getBoolean(4)))
    val spiky = series(Seq.fill(10)(100.0) ++ Seq(1000.0))
    val rows = TimeSeries.bollingerDaily(spiky, "ts", "v").collect()
    val last = rows.last
    assert(last.getDouble(1) == 1000.0 && last.getBoolean(4),
      s"spike day must breach: $last")
    assert(rows.init.forall(!_.getBoolean(4)))
  }

  test("seasonalDecompose: a pure weekly pattern has zero remainder " +
      "and seasonal components equal to the centred pattern") {
    val pattern = Seq(0.0, 10.0, 20.0, 30.0, 40.0, 50.0, 60.0)
    val vals = (0 until 28).map(i => 100.0 + pattern(i % 7))
    val out = TimeSeries.seasonalDecompose(series(vals), "ts", "v")
      .collect()
    assert(out.length == 7)
    assert(out.forall(_.getDouble(3) == 0.0),
      s"remainder must be 0: ${out.toSeq}")
    // centred MA of a periodic series is flat -> seasonal = pattern - 30
    assert(out.map(_.getDouble(2)).sorted.toSeq ==
      pattern.map(_ - 30.0).sorted)
  }

  test("pacfDaily: lag-1 pacf equals acf(1); lag-2 matches the " +
      "Durbin-Levinson form on the reported acf values") {
    val vals = Seq(110.0, 230.0, 150.0, 310.0, 190.0, 260.0, 140.0,
      330.0, 210.0, 120.0, 280.0, 170.0)
    val acf = TimeSeries.dailyAcf(series(vals), "ts", "v", 3).collect()
      .map(r => r.getInt(0) -> r.getDouble(2)).toMap
    val p = TimeSeries.pacfDaily(series(vals), "ts", "v").collect().head
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(p.getDouble(0) == r6(acf(1)))
    val exp2 = (acf(2) - acf(1) * acf(1)) / (1.0 - acf(1) * acf(1))
    assert(p.getDouble(1) == r6(exp2), s"$p vs $exp2")
  }

  test("mannKendallDaily: hand S/variance/continuity on monotone, " +
      "tied, and constant series") {
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // strictly rising 5 days: S = 10, no ties, 18·Var = 5·4·15 = 300,
    // z = (10−1)/√(300/18)
    val up = TimeSeries.mannKendallDaily(
      series(Seq(1.0, 2.0, 3.0, 4.0, 5.0)), "ts", "v").collect().head
    assert((up.getLong(0), up.getLong(1)) == ((5L, 10L)))
    assert(up.getDouble(2) == r6(9.0 / math.sqrt(300.0 / 18.0)), s"$up")
    // strictly falling mirrors with the +1 correction
    val dn = TimeSeries.mannKendallDaily(
      series(Seq(5.0, 4.0, 3.0, 2.0, 1.0)), "ts", "v").collect().head
    assert(dn.getLong(1) == -10L)
    assert(dn.getDouble(2) == r6(-9.0 / math.sqrt(300.0 / 18.0)), s"$dn")
    // a tie: [1, 1, 2] → S = 2, 18·Var = 3·2·11 − 2·1·9 = 48
    val tied = TimeSeries.mannKendallDaily(
      series(Seq(1.0, 1.0, 2.0)), "ts", "v").collect().head
    assert(tied.getLong(1) == 2L)
    assert(tied.getDouble(2) == r6(1.0 / math.sqrt(48.0 / 18.0)),
      s"$tied")
    // constant series: v18 = 0 forces S = 0 → z exactly +0.0
    val flat = TimeSeries.mannKendallDaily(
      series(Seq(7.0, 7.0, 7.0, 7.0)), "ts", "v").collect().head
    assert(flat.getLong(1) == 0L && flat.getDouble(2) == 0.0)
    assert(java.lang.Double.doubleToRawLongBits(flat.getDouble(2)) == 0L)
  }

  test("seasonalMannKendallDaily: within-stratum pairs only — a pure " +
      "period-2 cycle is NO trend seasonally while rising strata are; " +
      "period = 1 reduces to the unstratified test") {
    // alternating 1,9,1,9,...: raw MK sees a sawtooth; with period = 2
    // each stratum is CONSTANT → S = 0, v18 = 0 → z exactly +0.0
    val saw = series(Seq(1.0, 9.0, 1.0, 9.0, 1.0, 9.0))
    val s2 = TimeSeries.seasonalMannKendallDaily(saw, "ts", "v", 2)
      .collect().head
    assert((s2.getLong(0), s2.getLong(1), s2.getDouble(2)) ==
      ((6L, 0L, 0.0)), s"$s2")
    // rising strata under the cycle: 1,9,2,10,3,11 → each stratum
    // strictly rises: per stratum S = 3, v18 = 3·2·11 = 66 →
    // S = 6, v18 = 132, z = 5/√(132/18)
    val up = TimeSeries.seasonalMannKendallDaily(
      series(Seq(1.0, 9.0, 2.0, 10.0, 3.0, 11.0)), "ts", "v", 2)
      .collect().head
    val expZ = BigDecimal(5.0 / math.sqrt(132.0 / 18.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(up.getLong(1) == 6L && up.getDouble(2) == expZ, s"$up")
    // period = 1 ≡ the unstratified Mann–Kendall, cell for cell
    val vals = Seq(3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0)
    val a = TimeSeries.seasonalMannKendallDaily(series(vals), "ts",
      "v", 1).collect().head
    val b = TimeSeries.mannKendallDaily(series(vals), "ts", "v")
      .collect().head
    assert(a.toSeq == b.toSeq, s"$a vs $b")
  }

  test("runsTestDaily: alternating moves hit the hand z, flat days " +
      "drop as ties, monotone and degenerate sequences report null") {
    // 1,2,1,2,1,2,1 → six alternating moves, R = 6, n₊ = n₋ = 3:
    // μ = 2·9/6 + 1 = 4, σ² = 18·12/(36·5) = 1.2 → z = 2/√1.2
    val alt = TimeSeries.runsTestDaily(
      series(Seq(1.0, 2.0, 1.0, 2.0, 1.0, 2.0, 1.0)), "ts", "v")
      .collect().head
    assert((alt.getLong(0), alt.getLong(1), alt.getLong(2),
      alt.getLong(3)) == ((6L, 3L, 3L, 6L)))
    val expZ = BigDecimal(2.0 / math.sqrt(1.2))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(alt.getDouble(4) == expZ, s"$alt vs $expZ")
    // a flat day inside the sequence is a dropped tie, not a move
    val tied = TimeSeries.runsTestDaily(
      series(Seq(1.0, 2.0, 2.0, 1.0, 2.0)), "ts", "v").collect().head
    assert((tied.getLong(0), tied.getLong(3)) == ((3L, 3L)), s"$tied")
    // strictly rising: n₋ = 0 → zero variance → null z (R = 1)
    val mono = TimeSeries.runsTestDaily(
      series(Seq(1.0, 2.0, 3.0, 4.0)), "ts", "v").collect().head
    assert(mono.getLong(3) == 1L && mono.isNullAt(4), s"$mono")
    // one up one down: 2n₊n₋ − N = 0 → σ² = 0 → null
    val two = TimeSeries.runsTestDaily(
      series(Seq(1.0, 2.0, 1.0)), "ts", "v").collect().head
    assert(two.isNullAt(4), s"$two")
  }
}
