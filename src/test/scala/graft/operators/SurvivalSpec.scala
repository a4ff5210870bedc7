package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SurvivalSpec extends SparkSpec {
  import spark.implicits._

  private val day = 86400L

  test("kmDaily: textbook life table with censoring between events") {
    // A,B convert day 1; C converts day 3; D never converts (censored
    // at day 5). KM: d1 risk 4 events 2 → S=0.5; d3 risk 2 events 1 →
    // S=0.25. D holds the risk set at d3 — a latency-only histogram
    // would have said 1/1 converted.
    val units = Seq(
      (0L, Some(1L * day)), (0L, Some(1L * day)),
      (0L, Some(3L * day)), (0L, None)
    ).toDF("t0", "tp")
    val out = Survival.kmDaily(units, "t0", "tp", lit(5L * day))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSeq
    assert(out == Seq(
      (1L, 4L, 2L, 500000L, 0.5),
      (3L, 2L, 1L, 500000L, 0.25)))
  }

  test("rmstDaily: step-curve area with tail carry to the horizon") {
    // A,B convert day 1; C,D censored at day 3. KM: d1 risk 4 ev 2 →
    // S=0.5 (the only event day). RMST(5) = 1·(1−0) entering segment
    // + 0.5·(5−1) tail = 3.0; one event day.
    val units = Seq(
      (0L, Some(1L * day)), (0L, Some(1L * day)),
      (0L, None), (0L, None)
    ).toDF("t0", "tp")
    val out = Survival.rmstDaily(units, "t0", "tp", lit(3L * day), 5L)
      .collect().head
    assert((out.getLong(0), out.getLong(1), out.getDouble(2))
      == ((5L, 1L, 3.0)), s"$out")
    // horizon BEFORE the first event day: the whole area is the
    // S=1 entering segment clamped at tau — tail contributes 0.5·0
    val early = Survival.rmstDaily(units, "t0", "tp", lit(3L * day), 1L)
      .collect().head
    assert(early.getDouble(2) == 1.0, s"$early")
  }

  test("kmDaily: total conversion at the last step drives survival to " +
      "exactly 0 (ln pole handled, not NaN)") {
    val units = Seq((0L, Some(1L * day)), (0L, Some(2L * day)))
      .toDF("t0", "tp")
    val out = Survival.kmDaily(units, "t0", "tp", lit(9L * day))
      .collect().map(r => (r.getLong(0), r.getDouble(4))).toSeq
    assert(out == Seq((1L, 0.5), (2L, 0.0)))
  }

  test("viewToPurchase: purchase at-or-before the first view is " +
      "censored, not a zero-duration event") {
    val ev = Seq(
      (1L, "view", "2024-01-02 00:00:00"),
      (1L, "purchase", "2024-01-01 00:00:00"), // before first view
      (2L, "view", "2024-01-01 00:00:00"),
      (2L, "purchase", "2024-01-03 00:00:00"),
      (3L, "view", "2024-01-01 00:00:00")      // never purchases
    ).toDF("user_id", "event_type", "ts_s")
      .select(col("user_id"), col("event_type"),
        col("ts_s").cast("timestamp").as("ts"))
    val u = Survival.viewToPurchase(ev)
      .collect().map(r => (r.getLong(0), r.isNullAt(2))).toMap
    assert(u == Map(1L -> true, 2L -> false, 3L -> true))
  }

  test("logRank: identical survival in both groups gives chi2 ~ 0") {
    val durs = Seq(1L -> true, 2L -> true, 3L -> false, 5L -> true)
    val units = (durs.map { case (d, e) => (d, e, true) } ++
      durs.map { case (d, e) => (d, e, false) }).toDF("dur", "ev", "grp")
    val r = Survival.logRank(units).collect().head
    assert(r.getLong(0) == 4L && r.getLong(1) == 4L)
    assert(r.getDouble(4) < 1e-9, s"chi2 ${r.getDouble(4)}")
  }

  test("logRank: clearly separated hazards give a large chi2, and O1 " +
      "vs E1 points the right way (group 1 converts faster)") {
    val fast = (1 to 12).map(i => ((i % 3 + 1).toLong, true, true))
    val slow = (1 to 12).map(i => ((i % 3 + 20).toLong, true, false))
    val r = Survival.logRank((fast ++ slow).toDF("dur", "ev", "grp"))
      .collect().head
    assert(r.getLong(2) == 12L) // all group-1 events observed
    assert(r.getLong(2) > math.round(r.getDouble(3)),
      s"O1 ${r.getLong(2)} should exceed E1 ${r.getDouble(3)}")
    assert(r.getDouble(4) > 10.0, s"chi2 ${r.getDouble(4)}")
  }

  test("logRank: censored units hold the risk set without counting " +
      "as events (dropping them changes the statistic)") {
    val base = Seq((1L, true, true), (2L, true, true),
      (1L, true, false), (3L, true, false))
    val withCens = base ++ Seq((5L, false, false), (5L, false, false))
    val a = Survival.logRank(base.toDF("dur", "ev", "grp"))
      .collect().head.getDouble(4)
    val b = Survival.logRank(withCens.toDF("dur", "ev", "grp"))
      .collect().head.getDouble(4)
    assert(a != b, "censoring must matter")
  }

  test("kmDaily survival equals the directly-multiplied KM product") {
    // random-ish but fixed durations; compare against a local replica
    val durs = Seq(1L -> true, 1L -> true, 2L -> false, 2L -> true,
      4L -> true, 5L -> false, 6L -> true, 6L -> true, 7L -> false)
    val units = durs.map { case (d, ev) =>
      (0L, if (ev) Some(d * day) else None, d * day) }
      .toDF("t0", "tp", "cens")
    // per-unit censor column: censored units end at their own horizon
    val out = Survival.kmDaily(units, "t0", "tp", col("cens"))
      .collect().map(r => (r.getLong(0), r.getDouble(4))).toMap
    // local replica of discrete KM on the same convention
    var atRisk = durs.size
    var s = 1.0
    val expected = scala.collection.mutable.Map[Long, Double]()
    durs.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (d, g) =>
      val ev = g.count(_._2)
      if (ev > 0) {
        s *= 1.0 - ev.toDouble / atRisk
        expected(d) = s
      }
      atRisk -= g.size
    }
    assert(out.keySet == expected.keySet)
    out.foreach { case (d, v) =>
      assert(math.abs(v - expected(d)) < 1e-6, s"d=$d $v vs ${expected(d)}")
    }
  }

  test("nelsonAalenDaily: hand life table — censored units stay in " +
      "the risk set and the cumulative hazard adds exact terms") {
    // u1 events day 1 (risk 3), u2 events day 2 (risk 2), u3 censored
    val units = Seq(
      (0L, Some(86400L)), (0L, Some(172800L)), (0L, None))
      .toDF("t0", "tp")
    val out = Survival.nelsonAalenDaily(units, "t0", "tp", lit(172800L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(out.toSeq == Seq((1L, 3L, 1L, 0.333333),
      (2L, 2L, 1L, 0.833333)), s"${out.toSeq}")
  }
}
