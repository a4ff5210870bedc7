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
}
