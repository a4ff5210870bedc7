package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CalibrationSpec extends SparkSpec {
  import spark.implicits._

  private val W = Seq(0.05, 1.2, -0.8, 0.15, 2.0)
  private val B = -2.5

  test("bin accounting: counts, positives and ppm ratios are exact") {
    val docs = graft.Tables.documents(spark, SfDir)
    val out = QualityClassifier.calibration(docs, "text", W, B,
      col("lang") === "en").collect()
    val n = out.map(_.getLong(1)).sum
    assert(n == docs.count(), "every doc lands in exactly one bin")
    out.foreach { r =>
      val (nd, np) = (r.getLong(1), r.getLong(2))
      assert(np <= nd)
      // pos_rate is the truncated-ppm ratio
      assert(r.getDouble(4) == (np * 1000000L / nd).toDouble / 1e6)
      // avg_p must lie inside the bin's nominal probability range
      // (loose: bin edges are on the rounded p)
      val bin = r.getInt(0)
      assert(r.getDouble(3) >= bin / 10.0 - 1e-6 &&
        r.getDouble(3) <= (bin + 1) / 10.0 + 1e-6)
    }
  }

  test("a perfectly calibrated synthetic model has avg_p == pos_rate") {
    // construct docs whose truth is assigned at exactly the predicted
    // rate within a bin: p constant per group, truth fraction matches
    val docs = (1 to 1000).map { i =>
      (i.toLong, if (i % 2 == 0) "the and is of to in" else "zz qq xx")
    }.toDF("doc_id", "text")
    val out = QualityClassifier.calibration(docs, "text", W, B,
      // truth = the en-looking half — deliberately aligned with what
      // the en-stopword feature predicts
      col("text").contains("the"))
      .collect()
    // the en bin must have pos_rate 1, the other bin 0 — and the two
    // bins' avg_p must be ordered the same way
    val byRate = out.sortBy(_.getDouble(4))
    assert(byRate.head.getDouble(4) == 0.0 && byRate.last.getDouble(4) == 1.0)
    assert(byRate.head.getDouble(3) < byRate.last.getDouble(3),
      "higher observed rate must come with higher predicted p")
  }

  test("single-scan plan: one aggregate, no join, no window") {
    val docs = graft.Tables.documents(spark, SfDir)
    val plan = QualityClassifier.calibration(docs, "text", W, B,
      col("lang") === "en").queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Window"),
      s"calibration must be one scan + one agg:\n$plan")
  }

  test("brierDecomposition: the Murphy identity holds to rounding, " +
      "every term is in range, and a constant label zeroes res/unc") {
    val docs = graft.Tables.documents(spark, SfDir)
    val r = QualityClassifier.brierDecomposition(docs, "text", W, B,
      col("lang") === "en").collect().head
    val (brier, rel, res, unc, wbv, wbc) = (r.getDouble(1),
      r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
      r.getDouble(6))
    // brier = rel − res + unc + wbv − 2·wbc, up to the per-term 9-dp
    // roundings and the 6-dp output roundings
    assert(math.abs(brier - (rel - res + unc + wbv - 2 * wbc)) < 5e-6,
      s"identity: $brier vs ${rel - res + unc + wbv - 2 * wbc} ($r)")
    assert(brier >= 0 && rel >= 0 && res >= 0 && unc >= 0 && wbv >= 0)
    assert(unc <= 0.25 + 1e-9, "ō(1−ō) is bounded by 1/4")
    assert(res <= unc + 5e-6, "resolution can never beat the base-rate" +
      s" variance: $res vs $unc")
    // constant label: base rate 1 → unc = 0 and res = 0 exactly
    val const = QualityClassifier.brierDecomposition(docs, "text", W, B,
      lit(true)).collect().head
    assert(const.getDouble(3) == 0.0 && const.getDouble(4) == 0.0,
      s"$const")
  }
}
