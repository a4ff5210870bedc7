package graft.functions

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("kmv estimate within 35% of exact for k=64 on real data") {
    val li = Tables.lineitem(spark, SfDir)
    val est = Sketches.kmvDistinct(li, "l_returnflag", "l_partkey", 64)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct("l_partkey").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (g, n) =>
      val e = est(g)
      assert(math.abs(e - n) / n.toDouble < 0.35, s"$g: est $e vs exact $n")
    }
  }

  test("native aggregate is bit-identical to the DF-algebra form") {
    val li = Tables.lineitem(spark, SfDir)
    val native = Sketches.kmvDistinct(li, "l_returnflag", "l_partkey", 64)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val algebra = Sketches.kmvDistinctDf(li, "l_returnflag", "l_partkey", 64)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(native === algebra)
  }

  test("kmv is exact below k and deterministic") {
    val small = Seq(("a", 1), ("a", 2), ("a", 2), ("b", 9))
      .toDF("g", "v")
    val est = Sketches.kmvDistinct(small, "g", "v", 64)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(est("a") === 2.0)
    assert(est("b") === 1.0)
    val again = Sketches.kmvDistinct(small, "g", "v", 64)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(again === est)
  }
}
