package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ConformalSpec extends SparkSpec {
  import spark.implicits._

  test("thresholds: picks the ceil((n+1)(1-alpha))-th smallest score") {
    // n=9, alpha=0.2 → target = ceil(10*0.8) = 8 → 8th smallest = 80
    val df = (1 to 9).map(i => ("g", i * 10.0)).toDF("g", "score")
    val r = Conformal.thresholds(df, "g", "score", alpha = 0.2)
      .collect().head
    assert(r.getLong(1) == 9L && r.getDouble(2) == 80.0, s"$r")
  }

  test("thresholds: ties share rank mass — duplicated scores still " +
      "select the correct order statistic") {
    // scores: 1,2,2,2,3 (n=5), alpha=0.4 → target ceil(6*0.6)=4 →
    // 4th smallest = 2
    val df = Seq(1.0, 2.0, 2.0, 2.0, 3.0).map(("g", _)).toDF("g", "score")
    val r = Conformal.thresholds(df, "g", "score", alpha = 0.4)
      .collect().head
    assert(r.getDouble(2) == 2.0, s"$r")
  }

  test("thresholds: target beyond n_cal yields the honest null " +
      "(infinite interval), not a clamped max") {
    // n=3, alpha=0.1 → target = ceil(4*0.9) = 4 > 3
    val df = Seq(1.0, 2.0, 3.0).map(("g", _)).toDF("g", "score")
    val r = Conformal.thresholds(df, "g", "score", alpha = 0.1)
      .collect().head
    assert(r.getLong(1) == 3L && r.isNullAt(2), s"$r")
  }

  test("finite-sample coverage: on an exchangeable holdout, at least " +
      "(1-alpha) of scores fall at or below qhat") {
    // deterministic pseudo-random scores split into cal/test
    def score(i: Int) = ((i * 2654435761L) % 1000003L).toDouble
    val cal = (0 until 400).map(i => ("g", score(i * 2)))
    val test = (0 until 400).map(i => score(i * 2 + 1))
    val qhat = Conformal.thresholds(cal.toDF("g", "score"), "g", "score",
      alpha = 0.1).collect().head.getDouble(2)
    val covered = test.count(_ <= qhat).toDouble / test.size
    assert(covered >= 0.85, s"coverage $covered with qhat $qhat")
  }

  test("thresholds are per-group: groups select independently") {
    val df = ((1 to 9).map(i => ("a", i * 10.0))
      ++ (1 to 9).map(i => ("b", i * 1.0))).toDF("g", "score")
    val r = Conformal.thresholds(df, "g", "score", alpha = 0.2)
      .collect().map(x => x.getString(0) -> x.getDouble(2)).toMap
    assert(r == Map("a" -> 80.0, "b" -> 8.0), s"$r")
  }
}
