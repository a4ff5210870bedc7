package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TailBanditSpec extends SparkSpec {
  import spark.implicits._

  test("hill: exact Pareto(alpha) sample recovers alpha closely") {
    // deterministic Pareto(2) via inverse CDF on a uniform grid:
    // x = (1 - u)^(-1/2), u = i/n — heavy tail, finite sample
    val n = 2000
    val xs = (0 until n).map(i => math.pow(1.0 - i.toDouble / n, -0.5))
    val r = Tail.hill(xs.toDF("v"), "v", k = 200).collect().head
    assert(r.getLong(0) == 200L)
    assert(math.abs(r.getDouble(3) - 2.0) < 0.25,
      s"alpha ${r.getDouble(3)} should be near 2")
  }

  test("hill: exponential (light) tail yields a LARGE alpha — the " +
      "gate distinguishes tail classes") {
    val n = 2000
    val xs = (0 until n).map(i => -math.log(1.0 - i.toDouble / (n + 1)))
      .filter(_ > 0)
    val light = Tail.hill(xs.toDF("v"), "v", k = 200)
      .collect().head.getDouble(3)
    // Hill's alpha for an exponential at k/n = 0.1 sits near
    // ln(n/k) ≈ 2.3 and GROWS with n/k — comfortably above the
    // Pareto(2) estimate, which is the decision the gate makes
    assert(light > 2.8, s"exponential tail alpha $light")
  }

  test("hill: boundary ties shrink k deterministically, never double-" +
      "count the threshold value") {
    val xs = Seq(10.0, 9.0, 8.0, 7.0, 7.0, 7.0, 1.0)
    // k = 4 → top-5 = {10, 9, 8, 7, 7}, threshold 7, rows above = 3
    val r = Tail.hill(xs.toDF("v"), "v", k = 4).collect().head
    assert(r.getLong(0) == 3L && r.getDouble(1) == 7.0, s"$r")
  }

  test("ucb1: untried-arm bonus dominates — the least-pulled arm can " +
      "outrank a better-mean arm") {
    // arm a: 1000 pulls mean .9; arm b: 2 pulls mean .5 → b explores
    val rows = Seq.fill(1000)(("a", 0.9)) ++ Seq.fill(2)(("b", 0.5))
    val out = Bandit.ucb1(rows.toDF("arm", "r"), "arm", col("r"))
      .collect()
    assert(out.head.getString(0) == "b", s"${out.toSeq}")
  }

  test("ucb1 matches the closed-form score") {
    val rows = Seq(("a", 1.0), ("a", 0.0), ("b", 1.0), ("b", 1.0))
    val out = Bandit.ucb1(rows.toDF("arm", "r"), "arm", col("r"))
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    def u(m: Double, n: Int) = BigDecimal(
      m + math.sqrt(2.0 * math.log(4.0) / n))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out("a") == u(0.5, 2) && out("b") == u(1.0, 2), s"$out")
  }

  test("ucb1 ignores null rewards (impressions without outcomes)") {
    val df = Seq(("a", Some(1.0)), ("a", None), ("b", Some(0.5)))
      .toDF("arm", "r")
    val out = Bandit.ucb1(df, "arm", col("r")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("a" -> 1L, "b" -> 1L))
  }
}
