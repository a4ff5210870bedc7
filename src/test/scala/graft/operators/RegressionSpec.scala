package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RegressionSpec extends SparkSpec {
  import spark.implicits._

  test("ols2 recovers exact planted coefficients (noise-free)") {
    // y = 3 + 2*x1 - 5*x2 exactly: the normal equations are consistent
    // and the closed form must land on the plant (r2 = 1)
    val df = (1 to 200).map { i =>
      val x1 = (i % 17).toDouble
      val x2 = (i % 7).toDouble
      (3.0 + 2.0 * x1 - 5.0 * x2, x1, x2)
    }.toDF("y", "x1", "x2")
    val r = Regression.ols2(df, "y", "x1", "x2").head()
    assert(r.getLong(0) == 200)
    assert(r.getDouble(1) == 3.0, s"b0=${r.getDouble(1)}")
    assert(r.getDouble(2) == 2.0, s"b1=${r.getDouble(2)}")
    assert(r.getDouble(3) == -5.0, s"b2=${r.getDouble(3)}")
    assert(r.getDouble(4) == 1.0, s"r2=${r.getDouble(4)}")
  }

  test("ols2 with noise: coefficients near plant, 0 < r2 < 1") {
    val df = (1 to 1000).map { i =>
      val x1 = (i % 23).toDouble
      val x2 = (i % 11).toDouble
      val noise = ((i * 7919) % 200 - 100) / 100.0 // deterministic ±1
      (10.0 + 0.5 * x1 + 1.5 * x2 + noise, x1, x2)
    }.toDF("y", "x1", "x2")
    val r = Regression.ols2(df, "y", "x1", "x2").head()
    assert(math.abs(r.getDouble(1) - 10.0) < 0.2)
    assert(math.abs(r.getDouble(2) - 0.5) < 0.05)
    assert(math.abs(r.getDouble(3) - 1.5) < 0.05)
    assert(r.getDouble(4) > 0.9 && r.getDouble(4) < 1.0)
  }

  test("ols2 is one aggregation: no join, no window, single scan") {
    val df = graft.Tables.lineitem(spark, SfDir)
    val plan = Regression
      .ols2(df, "l_extendedprice", "l_quantity", "l_discount")
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Join"), s"ols2 must not join:\n$plan")
    assert(!plan.contains("Window"), s"ols2 must not window:\n$plan")
  }

  test("logisticIrls2 separates a linearly separable-ish problem with " +
      "high accuracy and the right coefficient signs") {
    import spark.implicits._
    // y = 1 when x1 + x2 > 1 with a logistic-ish soft boundary
    val rows = (0 until 400).map { i =>
      val x1 = (i % 20) / 10.0
      val x2 = ((i / 20) % 20) / 10.0
      val y = if (x1 + x2 > 2.0) 1.0 else 0.0
      (y, x1, x2)
    }
    val r = Regression.logisticIrls2(rows.toDF("y", "x1", "x2"),
      "y", "x1", "x2", iters = 4).collect().head
    assert(r.getLong(0) == 400L)
    assert(r.getDouble(2) > 0 && r.getDouble(3) > 0,
      s"positive effects expected: $r")
    assert(r.getDouble(4) > 0.9, s"accuracy ${r.getDouble(4)}")
  }

  test("logisticIrls2 is deterministic and partitioning-independent") {
    import spark.implicits._
    val rows = (0 until 300).map(i =>
      (if (i % 3 == 0) 1.0 else 0.0, (i % 7) / 3.0, (i % 11) / 5.0))
    val df = rows.toDF("y", "x1", "x2")
    val a = Regression.logisticIrls2(df, "y", "x1", "x2", 3)
      .collect().head.toSeq
    val b = Regression.logisticIrls2(df.repartition(13), "y", "x1", "x2", 3)
      .collect().head.toSeq
    assert(a == b)
  }

  test("ridge2 at lambda = 0 coincides with ols2; a large lambda " +
      "shrinks the slopes toward zero") {
    import spark.implicits._
    val rows = (1 to 60).map { i =>
      val x1 = (i % 10).toDouble; val x2 = (i % 7).toDouble
      (3.0 + 2.0 * x1 - 1.5 * x2 + (i % 3 - 1) * 0.25, x1, x2)
    }
    val df = rows.toDF("y", "x1", "x2")
    val o = Regression.ols2(df, "y", "x1", "x2").collect().head
    val r0 = Regression.ridge2(df, "y", "x1", "x2", 0.0).collect().head
    // ols2 row is (n, b0, b1, b2, r2); ridge2 row is (n, lambda, b0, b1, b2)
    assert(Seq(1, 2, 3).forall(i =>
      o.getDouble(i) == r0.getDouble(i + 1)),
      s"lambda=0 must reproduce OLS: $o vs $r0")
    val rBig = Regression.ridge2(df, "y", "x1", "x2", 1e6).collect().head
    assert(math.abs(rBig.getDouble(3)) < math.abs(o.getDouble(2)), s"$rBig")
    assert(math.abs(rBig.getDouble(4)) < math.abs(o.getDouble(3)), s"$rBig")
  }

  test("priceElasticity recovers a planted constant-elasticity " +
      "demand curve (qty ~ price^-2)") {
    import spark.implicits._
    // qty = 10000 / p^2 exactly, revenue = p * qty — slope must be -2
    val rows = Seq(1.0, 2.0, 4.0, 5.0, 8.0, 10.0).zipWithIndex.map {
      case (p, i) =>
        val qty = 10000.0 / (p * p)
        (i.toLong, p * qty, qty)
    }
    val r = Regression.priceElasticity(rows.toDF("pk", "rev", "qty"),
      "pk", "rev", "qty").collect().head
    assert(r.getLong(0) == 6L)
    assert(math.abs(r.getDouble(1) - (-2.0)) < 1e-4, s"$r")
    assert(r.getDouble(3) > 0.9999, s"$r")
  }

  test("cvRidge: on a clean planted model the unpenalized lambda " +
      "wins and a huge lambda pays in validation RMSE; " +
      "partitioning-independent") {
    import spark.implicits._
    val rows = (0 until 400).map { i =>
      val x1 = (i % 9).toDouble; val x2 = (i % 5).toDouble
      (i.toLong, 3.0 + 2.0 * x1 - x2 + (i % 3 - 1) * 0.1, x1, x2)
    }
    val df = rows.toDF("id", "y", "x1", "x2")
    val out = Regression.cvRidge(df, "y", "x1", "x2", col("id"),
      Seq(0.0, 1.0e7)).collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(out(0.0) < 0.2, s"clean fit expected: $out")
    assert(out(1.0e7) > 2.0 * out(0.0),
      s"heavy shrinkage must cost validation error: $out")
    val again = Regression.cvRidge(df.repartition(11), "y", "x1", "x2",
      col("id"), Seq(0.0, 1.0e7)).collect().map(_.toSeq).toSeq
    assert(again == Regression.cvRidge(df, "y", "x1", "x2", col("id"),
      Seq(0.0, 1.0e7)).collect().map(_.toSeq).toSeq)
  }

  test("logisticIrls2: a constant y = 1 drives the intercept large " +
      "and positive (prior saturation, no crash)") {
    import spark.implicits._
    val rows = (0 until 100).map(i => (1.0, (i % 5) / 2.0, (i % 3) / 2.0))
    val r = Regression.logisticIrls2(rows.toDF("y", "x1", "x2"),
      "y", "x1", "x2", iters = 3).collect().head
    assert(r.getDouble(1) > 1.0, s"$r")
    assert(r.getDouble(4) == 1.0)
  }
}
