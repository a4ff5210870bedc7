package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AbTestSpec extends SparkSpec {
  import spark.implicits._

  // units: (id, x = pre metric, y = in-experiment metric); arm by parity
  private val units = Seq(
    (1L, 10.0, 25.0), (3L, 20.0, 41.0), (5L, 30.0, 66.0), (7L, 40.0, 84.0),
    (2L, 10.0, 22.0), (4L, 20.0, 40.0), (6L, 30.0, 61.0), (8L, 40.0, 79.0))
    .toDF("id", "x", "y")

  test("cuped: theta and adjusted lift match a direct computation") {
    val r = AbTest.cuped(units, "x", "y", col("id") % 2 === 1)
      .collect().head
    // local replica on plain doubles (inputs are exact decimals)
    val xs = Seq(10.0, 20.0, 30.0, 40.0, 10.0, 20.0, 30.0, 40.0)
    val ys = Seq(25.0, 41.0, 66.0, 84.0, 22.0, 40.0, 61.0, 79.0)
    val n = xs.size.toDouble
    val sx = xs.sum; val sy = ys.sum
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val sxx = xs.map(a => a * a).sum
    val theta = (sxy - sx * sy / n) / (sxx - sx * sx / n)
    val mx = sx / n
    val ya = Seq(25.0, 41.0, 66.0, 84.0); val xa = Seq(10.0, 20.0, 30.0, 40.0)
    val yb = Seq(22.0, 40.0, 61.0, 79.0)
    val adjA = ya.sum / 4 - theta * (xa.sum / 4 - mx)
    val adjB = yb.sum / 4 - theta * (xa.sum / 4 - mx)
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getLong(0) == 4L && r.getLong(1) == 4L)
    assert(r.getDouble(2) == r6(theta))
    assert(r.getDouble(6) == r6(adjA - adjB), s"$r")
  }

  test("cuped: adjusted lift is invariant to a constant shift of the " +
      "covariate (raw lift unchanged, theta unchanged)") {
    val shifted = units.withColumn("x", col("x") + lit(100.0))
    val a = AbTest.cuped(units, "x", "y", col("id") % 2 === 1)
      .collect().head
    val b = AbTest.cuped(shifted, "x", "y", col("id") % 2 === 1)
      .collect().head
    assert(a.getDouble(2) == b.getDouble(2)) // theta
    assert(a.getDouble(5) == b.getDouble(5)) // lift_raw
    assert(a.getDouble(6) == b.getDouble(6)) // lift_cuped
  }

  test("cuped: with a perfectly balanced covariate, adjusted and raw " +
      "lifts coincide") {
    // both arms see the identical covariate distribution → the
    // adjustment term cancels exactly
    val r = AbTest.cuped(units, "x", "y", col("id") % 2 === 1)
      .collect().head
    assert(r.getDouble(5) == r.getDouble(6), s"$r")
  }

  test("cuped reduces readout variance on correlated metrics " +
      "(the point of the method): |adjusted arm gap| <= |raw gap| " +
      "when the covariate imbalance inflates the raw lift") {
    // arm A drew richer pre-period users; y = x + small effect
    val skew = Seq(
      (1L, 40.0, 42.0), (3L, 50.0, 53.0), (5L, 60.0, 62.0),
      (2L, 10.0, 11.0), (4L, 20.0, 22.0), (6L, 30.0, 31.0))
      .toDF("id", "x", "y")
    val r = AbTest.cuped(skew, "x", "y", col("id") % 2 === 1)
      .collect().head
    assert(math.abs(r.getDouble(6)) < math.abs(r.getDouble(5)), s"$r")
  }

  test("anovaF: hand-computed two-group F (separated means) and dofs") {
    // A = {1,2,3} (mean 2), B = {5,6,7} (mean 6): SSB = 24, SSW = 4,
    // F = (24/1)/(4/4) = 24, df1 = 1, df2 = 4
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 5.0), ("b", 6.0), ("b", 7.0)).toDF("g", "v")
    val r = AbTest.anovaF(df, "g", "v").collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 6L)
    assert(r.getDouble(2) == 24.0, s"$r")
    assert(r.getLong(3) == 1L && r.getLong(4) == 4L)
  }

  test("anovaF: identical group distributions give F = 0; result is " +
      "partitioning-independent") {
    val df = Seq(("a", 1.0), ("a", 3.0), ("b", 1.0), ("b", 3.0),
      ("c", 1.0), ("c", 3.0)).toDF("g", "v")
    val r = AbTest.anovaF(df, "g", "v").collect().head
    assert(r.getDouble(2) == 0.0, s"$r")
    val big = (1 to 500).map(i => (s"g${i % 4}", (i % 13) / 2.0))
      .toDF("g", "v")
    val a = AbTest.anovaF(big, "g", "v").collect().head.toSeq
    val b = AbTest.anovaF(big.repartition(17), "g", "v")
      .collect().head.toSeq
    assert(a == b)
  }

  test("etaSquared: a dimension that fully determines the value " +
      "scores 1; an orthogonal dimension scores ~0") {
    val df = (0 until 240).map { i =>
      val a = s"a${i % 3}"        // determines v completely
      val b = s"b${(i / 3) % 4}"  // orthogonal
      (a, b, 10.0 * (i % 3))
    }.toDF("dim_a", "dim_b", "v")
    val out = AbTest.etaSquared(df, Seq("dim_a", "dim_b"), "v")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2))).toMap
    assert(out("dim_a") == ((3L, 1.0)), s"$out")
    assert(out("dim_b")._1 == 4L && out("dim_b")._2 < 0.01, s"$out")
  }

  test("brownForsythe: equal spread around different medians gives " +
      "F = 0 (location-free); unequal spreads a positive F") {
    val equal = Seq(("a", 1.0), ("a", 3.0), ("b", 11.0), ("b", 13.0))
      .toDF("g", "v")
    val r = AbTest.brownForsythe(equal, "g", "v").collect().head
    assert(r.getDouble(2) == 0.0, s"$r")
    val unequal = Seq(("a", 1.0), ("a", 1.0), ("a", 1.2), ("a", 1.2),
      ("b", 0.0), ("b", 0.0), ("b", 20.0), ("b", 20.0)).toDF("g", "v")
    val r2 = AbTest.brownForsythe(unequal, "g", "v").collect().head
    // hand: dev means .1 vs 10, SSB = 196.02, SSW = 400.04, df2 = 6
    assert(r2.getDouble(2) > 2.5 && r2.getDouble(2) < 3.5, s"$r2")
    assert(r2.getLong(3) == 1L && r2.getLong(4) == 6L)
  }

  test("sequentialZ: a strong effect crosses on the day the pooled z " +
      "first clears the boundary; an A/A never crosses") {
    import java.sql.Date
    // day 1: 10 per arm, T 6/10 vs C 4/10 → |z| small; day 2 adds
    // 40 per arm at T 90% vs C 10% → cumulative z blows past 2.5
    def day(d: String, t: Boolean, s: Boolean, n: Int) =
      Seq.fill(n)((Date.valueOf(d), t, s))
    val rows =
      day("2024-01-01", true, true, 6) ++ day("2024-01-01", true, false, 4) ++
      day("2024-01-01", false, true, 4) ++ day("2024-01-01", false, false, 6) ++
      day("2024-01-02", true, true, 36) ++ day("2024-01-02", true, false, 4) ++
      day("2024-01-02", false, true, 4) ++ day("2024-01-02", false, false, 36)
    val df = rows.toDF("ts", "t", "s")
    val out = AbTest.sequentialZ(df, "ts", col("t"), col("s"), 2.5)
      .collect().head
    assert(out.getLong(0) == 2L, s"$out")
    assert(out.getDate(1) == Date.valueOf("2024-01-02"), s"$out")
    assert(out.getDouble(2) > 2.5 && out.getLong(3) == 100L, s"$out")
    // A/A: identical arms → z = 0 everywhere, never crosses
    val aa = day("2024-01-01", true, true, 5) ++
      day("2024-01-01", true, false, 5) ++
      day("2024-01-01", false, true, 5) ++
      day("2024-01-01", false, false, 5)
    val r0 = AbTest.sequentialZ(aa.toDF("ts", "t", "s"), "ts",
      col("t"), col("s"), 2.5).collect().head
    assert(r0.isNullAt(1) && r0.getDouble(2) == 0.0, s"$r0")
  }

  test("sequentialZ: a zero-conversion prefix (pooled p = 0) is a " +
      "null-z day in both engines, not an ANSI divide-by-zero") {
    import java.sql.Date
    def day(d: String, t: Boolean, s: Boolean, n: Int) =
      Seq.fill(n)((Date.valueOf(d), t, s))
    // day 1 has arms but NO successes → pooled variance 0 → z null
    // (DuckDB float x/0 is NULL; ANSI Spark would throw unguarded —
    // the sf0.001 q326 regression). day 2 brings real conversions.
    val rows =
      day("2024-01-01", true, false, 10) ++
      day("2024-01-01", false, false, 10) ++
      day("2024-01-02", true, true, 9) ++ day("2024-01-02", true, false, 1) ++
      day("2024-01-02", false, true, 1) ++ day("2024-01-02", false, false, 9)
    val out = AbTest.sequentialZ(rows.toDF("ts", "t", "s"), "ts",
      col("t"), col("s"), 2.5).collect().head
    assert(out.getLong(0) == 1L, s"day 1 must drop as null-z: $out")
    assert(out.getDate(1) == Date.valueOf("2024-01-02"), s"$out")
  }
}
