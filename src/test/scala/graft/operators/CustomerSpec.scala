package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CustomerSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int) = java.sql.Timestamp.valueOf(
    java.time.LocalDate.of(2024, 1, 1).plusDays(day - 1).atStartOfDay)

  test("rfmSegments: every customer lands in exactly one cell and " +
      "counts/revenue reconcile") {
    val orders = graft.Tables.orders(spark, SfDir)
    val out = Customer.rfmSegments(orders, "o_custkey", "o_orderdate",
      "o_totalprice").collect()
    val nCust = orders.select("o_custkey").distinct().count()
    assert(out.map(_.getLong(3)).sum == nCust)
    out.foreach { r =>
      Seq(r.getInt(0), r.getInt(1), r.getInt(2)).foreach(s =>
        assert(s >= 1 && s <= 4, s"score out of range: $r"))
    }
  }

  test("rfmSegments: hand fixture — quartile scores follow the " +
      "strictly-exceeds convention") {
    // 4 customers: monetary 10/20/30/40 → m thresholds 10/20/30 →
    // scores 1/2/3/4; all same recency (score 1) and frequency 1
    val orders = Seq(
      (1L, ts(5), 10.0), (2L, ts(5), 20.0),
      (3L, ts(5), 30.0), (4L, ts(5), 40.0)
    ).toDF("o_custkey", "o_orderdate", "o_totalprice")
    val out = Customer.rfmSegments(orders, "o_custkey", "o_orderdate",
      "o_totalprice").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    assert(out.toSeq == Seq((1, 1, 1, 1L), (1, 1, 2, 1L),
      (1, 1, 3, 1L), (1, 1, 4, 1L)), s"${out.toSeq}")
  }

  test("cohortLtv: cumulative within cohort is monotone and the tail " +
      "equals cohort revenue / cohort size") {
    val orders = Seq(
      // cohort Jan: cust 1 buys Jan 100, Feb 50; cust 2 buys Jan 30
      (1L, ts(10), 100.0), (1L, ts(40), 50.0), (2L, ts(20), 30.0),
      // cohort Feb: cust 3 buys Feb 80, Apr 20
      (3L, ts(35), 80.0), (3L, ts(100), 20.0)
    ).toDF("o_custkey", "o_orderdate", "o_totalprice")
    val out = Customer.cohortLtv(orders, "o_custkey", "o_orderdate",
      "o_totalprice").collect()
      .map(r => (r.getTimestamp(0).toString.take(7), r.getInt(1),
        r.getLong(2), r.getDouble(3), r.getDouble(4)))
    val jan = out.filter(_._1 == "2024-01")
    assert(jan.map(_._2).toSeq == Seq(0, 1))
    assert(jan.map(_._4).toSeq == Seq(130.0, 180.0)) // cumulative
    assert(jan.last._5 == 90.0) // 180 / 2 customers
    val feb = out.filter(_._1 == "2024-02")
    assert(feb.map(_._4).toSeq == Seq(80.0, 100.0))
    assert(feb.map(_._2).toSeq == Seq(0, 2)) // gap month absent, not 0
    assert(feb.forall(_._3 == 1L))
  }

  test("abcClasses: hand case at 80/95 permille — cumulative-share " +
      "boundaries are inclusive and exact") {
    // revenues 50, 30, 15, 5 (total 100): cum shares 50, 80, 95, 100
    // -> A = {50, 30} (<= 800 permille), B = {15} (<= 950), C = {5}
    val df = Seq((1L, 50.0), (2L, 30.0), (3L, 15.0), (4L, 5.0))
      .toDF("id", "rev")
    val out = Customer.abcClasses(df, "id", "rev").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getLong(3)))
    assert(out.toSeq == Seq(("A", 2L, 80.0, 800000L),
      ("B", 1L, 15.0, 150000L), ("C", 1L, 5.0, 50000L)), s"${out.toSeq}")
  }

  test("revenueBridge: hand-decomposed price/volume/new/lost effects " +
      "reconcile to the total revenue delta") {
    // P1: A (q10 @5 = 50), B (q4 @10 = 40), lost C (7)
    // P2: A (q12 @6 = 72), B (q2 @10 = 20), new D (9)
    // price = 12, volume = -10, new = 9, lost = -7, delta = 4
    val rows = Seq(
      ("A", false, 50.0, 10.0), ("B", false, 40.0, 4.0),
      ("C", false, 7.0, 1.0),
      ("A", true, 72.0, 12.0), ("B", true, 20.0, 2.0),
      ("D", true, 9.0, 1.0))
    val df = rows.toDF("e", "isP2", "rev", "qty")
    val out = Customer.revenueBridge(df, "e", col("isP2"), "rev", "qty")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("1_price") == 12.0, s"$out")
    assert(out("2_volume") == -10.0, s"$out")
    assert(out("3_new") == 9.0 && out("4_lost") == -7.0)
    assert(out("5_delta_total") == 4.0)
    assert(math.abs(out("1_price") + out("2_volume") + out("3_new")
      + out("4_lost") - out("5_delta_total")) < 1e-9)
  }

  test("lorenzDeciles: values 1..20 give exact ascending cumulative " +
      "shares; a uniform base tracks the diagonal") {
    val df = (1 to 20).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val out = Customer.lorenzDeciles(df, "id", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3)))
    assert(out.length == 10 && out.forall(_._2 == 2L))
    assert(out.head == ((0L, 2L, 3.0, 3L * 1000000L / 210L)))
    assert(out.last._4 == 1000000L, s"${out.toSeq}")
    val flat = (1 to 20).map(i => (i.toLong, 5.0)).toDF("id", "v")
    val fo = Customer.lorenzDeciles(flat, "id", "v").collect()
      .map(r => (r.getLong(0), r.getLong(3)))
    assert(fo.forall { case (d, ppm) =>
      ppm == (d + 1) * 2L * 1000000L / 20L }, s"${fo.toSeq}")
  }

  test("abcClasses aggregates per entity first and ties rank " +
      "deterministically by id; partitioning-independent") {
    // entity 1 has two rows summing 60; ties between 2 and 3 (20 each)
    val df = Seq((1L, 40.0), (1L, 20.0), (2L, 20.0), (3L, 20.0))
      .toDF("id", "rev")
    val a = Customer.abcClasses(df, "id", "rev").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    // cum: 60 (A, 600 <= 800), 80 (A), 100 (C? 80+20=100 > 95) ->
    // A = {1, 2}, C = {3}
    assert(a == Seq(("A", 2L), ("C", 1L)), s"$a")
    val b = Customer.abcClasses(df.repartition(5), "id", "rev")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(a == b)
  }
}
