package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MatrixStatsSpec extends SparkSpec {
  import spark.implicits._

  test("known correlations: perfect positive, perfect negative, zero") {
    val df = Seq(
      (1.0, 2.0, -1.0, 5.0),
      (2.0, 4.0, -2.0, 5.0),
      (3.0, 6.0, -3.0, 5.0),
      (4.0, 8.0, -4.0, 5.0)).toDF("a", "b", "c", "d")
    val out = MatrixStats.correlationMatrix(df, Seq("a", "b", "c"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(out(("a", "a")) == 1.0)
    assert(out(("a", "b")) == 1.0, "b = 2a must correlate 1")
    assert(out(("a", "c")) == -1.0, "c = -a must correlate -1")
  }

  test("agrees with Spark's builtin corr on the fixture money columns") {
    val li = graft.Tables.lineitem(spark, SfDir)
    val out = MatrixStats.correlationMatrix(li,
      Seq("l_discount", "l_extendedprice", "l_quantity", "l_tax"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    for (a <- Seq("l_discount", "l_quantity");
         b <- Seq("l_extendedprice", "l_tax")) {
      val key = if (a <= b) (a, b) else (b, a) // matrix stores a ≤ b
      val ref = li.agg(corr(col(a), col(b))).head().getDouble(0)
      assert(math.abs(out(key) - ref) < 1e-5,
        s"corr($a,$b): ${out(key)} vs builtin $ref")
    }
  }

  test("one scan regardless of pair count: a single aggregate node") {
    val li = graft.Tables.lineitem(spark, SfDir)
    val plan = MatrixStats.correlationMatrix(li,
      Seq("l_discount", "l_extendedprice", "l_quantity", "l_tax"))
      .queryExecution.executedPlan.toString
    // one HashAggregate pair (partial+final) over one scan, no join
    assert(!plan.contains("Join"), s"moments must come from ONE scan:\n$plan")
    assert(plan.split("FileScan").length == 2,
      s"exactly one file scan expected:\n$plan")
  }
}
