package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FairnessSpec extends SparkSpec {
  import spark.implicits._

  test("audit: hand confusion rates per group, parity/odds gaps, and " +
      "null rates for degenerate groups") {
    // A: labels (1,1,0,0), preds (1,0,1,0) → sel .5, tpr .5, fpr .5
    // B: labels (1,1), preds (1,1) → sel 1, tpr 1, fpr null (no negatives)
    val df = Seq(
      ("A", true, true), ("A", true, false),
      ("A", false, true), ("A", false, false),
      ("B", true, true), ("B", true, true))
      .toDF("g", "y", "p")
    val rows = Fairness.audit(df, "g", col("y"), col("p"))
      .collect().map(r => r.getString(0) -> r).toMap
    val a = rows("A"); val b = rows("B")
    assert((a.getLong(1), a.getLong(2), a.getLong(3)) == ((4L, 2L, 2L)))
    assert((a.getDouble(4), a.getDouble(5), a.getDouble(6)) ==
      ((0.5, 0.5, 0.5)))
    assert((b.getDouble(4), b.getDouble(5)) == ((1.0, 1.0)))
    assert(b.isNullAt(6), "all-positive group has no FPR")
    // gaps: dp = 1 − .5; tpr = 1 − .5; fpr over the single defined
    // group = 0 exactly (max = min)
    assert((a.getDouble(7), a.getDouble(8), a.getDouble(9)) ==
      ((0.5, 0.5, 0.0)))
    assert(a.getDouble(7) == b.getDouble(7), "gaps are global constants")
  }

  test("audit: single group → all gaps exactly +0.0; " +
      "partitioning-independent") {
    val df = (1 to 40).map(i => ("only", i % 3 == 0, i % 2 == 0))
      .toDF("g", "y", "p")
    val r = Fairness.audit(df, "g", col("y"), col("p")).collect().head
    assert(r.getDouble(7) == 0.0 && r.getDouble(8) == 0.0
      && r.getDouble(9) == 0.0)
    val r2 = Fairness.audit(df.repartition(7), "g", col("y"), col("p"))
      .collect().head
    assert(r.toSeq == r2.toSeq)
  }
}
