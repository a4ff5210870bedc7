package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ResampleSpec extends SparkSpec {
  import spark.implicits._

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def evenNibble(s: String): Boolean =
    "02468ace".contains(md5Hex(s).charAt(0))

  test("permutationTest matches an exact local replay of the seeded " +
      "flips (signs, sums, extremeness, p-value)") {
    val diffs = Seq(1L -> 2.5, 2L -> -1.0, 3L -> 0.5, 4L -> 3.0,
      5L -> -0.25, 6L -> 1.75, 7L -> 0.125, 8L -> -2.0)
    val out = Resample.permutationTest(
      diffs.toDF("k", "d"), "k", "d", mPerms = 50).collect().head
    // local replay with BigDecimal sums (the operator's 9-dp decimals)
    def d9(x: Double) = BigDecimal(x).setScale(9,
      BigDecimal.RoundingMode.HALF_UP)
    val t0 = diffs.map(x => d9(x._2)).sum
    val nExt = (0 until 50).count { p =>
      val tp = diffs.map { case (k, d) =>
        if (evenNibble(s"${p}_$k")) d9(d) else -d9(d) }.sum
      tp.abs >= t0.abs
    }
    assert(out.getLong(0) == 8L)
    assert(out.getInt(2) == 50)
    assert(out.getLong(3) == nExt.toLong, s"$out vs local $nExt")
    val pExp = BigDecimal((1.0 + nExt) / 51.0).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.getDouble(4) == pExp)
  }

  test("permutationTest: a strong one-sided effect is significant, " +
      "and the add-one p-value is never 0") {
    val df = (1L to 12L).map(k => (k, 5.0)).toDF("k", "d")
    val r = Resample.permutationTest(df, "k", "d", mPerms = 200)
      .collect().head
    assert(r.getDouble(4) < 0.05, s"p=${r.getDouble(4)}")
    assert(r.getDouble(4) > 0.0)
  }

  test("permutationTest: pure noise is not significant") {
    // antisymmetric diffs: under sign flips, T_0 = 0 is the MINIMUM
    // possible |T|, so every permutation is at least as extreme
    val df = (1L to 10L).map(k => (k, if (k % 2 == 0) 1.0 else -1.0))
      .toDF("k", "d")
    val r = Resample.permutationTest(df, "k", "d", mPerms = 100)
      .collect().head
    assert(r.getDouble(4) == 1.0, s"$r")
  }

  test("jackknifeRatio: constant per-unit ratio has zero jackknife SE " +
      "and r equals the plain ratio") {
    val df = (1L to 500L).map(k => (k, 7.0, 1.0)).toDF("k", "y", "x")
    val r = Resample.jackknifeRatio(df, "k", "y", "x", nBuckets = 16)
      .collect().head
    assert(r.getDouble(0) == 7.0 && r.getDouble(1) == 0.0
      && r.getInt(2) == 16, s"$r")
  }

  test("jackknifeRatio matches a local replay of the bucketed " +
      "leave-one-out computation") {
    val units = (1L to 300L).map(k => (k, (k % 13).toDouble, 1.0))
    val out = Resample.jackknifeRatio(units.toDF("k", "y", "x"),
      "k", "y", "x", nBuckets = 8).collect().head
    // local replay: same md5 bucket, decimal-exact sums
    def bucket(k: Long): Int =
      (BigInt(md5Hex(k.toString).take(15), 16) % 8).toInt
    val by = units.groupBy(u => bucket(u._1))
    val sy = by.view.mapValues(_.map(u => BigDecimal(u._2)).sum).toMap
    val sx = by.view.mapValues(_.map(u => BigDecimal(u._3)).sum).toMap
    val (ty, tx) = (sy.values.sum, sx.values.sum)
    def d9(x: Double) = BigDecimal(x).setScale(9,
      BigDecimal.RoundingMode.HALF_UP)
    val ri = sy.keys.toSeq.map(b =>
      d9((ty - sy(b)).toDouble / (tx - sx(b)).toDouble))
    val rbar = (ri.sum.toDouble / ri.size)
    def d6(x: Double) = BigDecimal(x).setScale(6,
      BigDecimal.RoundingMode.HALF_UP)
    val ss = ri.map(r => d6((r.toDouble - rbar) * (r.toDouble - rbar))).sum
    val se = d6(math.sqrt((ri.size - 1.0) / ri.size * ss.toDouble)).toDouble
    assert(out.getDouble(1) == se, s"${out.getDouble(1)} vs $se")
    assert(out.getDouble(0) == d6(ty.toDouble / tx.toDouble).toDouble)
  }

  test("permutationTestsFdr: a strong-effect cell is rejected, a " +
      "sign-balanced null cell is not; single-cell stats match " +
      "permutationTest exactly") {
    import org.apache.spark.sql.functions.col
    val effect = (1 to 40).map(i => ("x", s"u$i", 5.0))
    val noise = (1 to 40).map(i =>
      ("z", s"v$i", if (i % 2 == 0) 1.0 else -1.0))
    val df = (effect ++ noise).toDF("cell", "k", "d")
    val out = Resample.permutationTestsFdr(df, "cell", "k", "d",
      mPerms = 100).collect()
      .map(r => r.getString(0) ->
        (r.getLong(3), r.getDouble(4), r.getBoolean(5))).toMap
    assert(out("x")._3, s"effect cell must be significant: $out")
    assert(!out("z")._3, s"null cell must not: $out")
    assert(out("x")._2 < 0.05 && out("z")._2 > 0.2)
    // the fleet's per-cell counts equal the standalone test's
    val solo = Resample.permutationTest(
      effect.toDF("cell", "k", "d"), "k", "d", mPerms = 100)
      .collect().head
    assert(solo.getLong(3) == out("x")._1)
  }

  test("permutationTestsFdr BH step-up: with k cells the smallest " +
      "p is judged against alpha/k (integer arithmetic, no floats)") {
    import org.apache.spark.sql.functions.col
    // two cells, both with the same strong effect: both should pass
    // even though the threshold for the smaller rank is alpha/2
    val df = ((1 to 40).map(i => ("a", s"u$i", 3.0)) ++
      (1 to 40).map(i => ("b", s"w$i", 3.0))).toDF("cell", "k", "d")
    val out = Resample.permutationTestsFdr(df, "cell", "k", "d",
      mPerms = 100).collect()
    assert(out.forall(_.getBoolean(5)), s"${out.toSeq}")
  }
}
