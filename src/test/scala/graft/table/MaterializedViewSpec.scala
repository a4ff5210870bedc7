package graft.table

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class MaterializedViewSpec extends SparkSpec {

  private def cust =
    Tables.customer(spark, SfDir)
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))

  private def canon(df: DataFrame): Seq[(String, Long, Double)] =
    df.select(col("c_mktsegment"), col("n_rows"),
        col("total").cast("double"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1).toSeq

  test("maintain over insert+delete+update delta equals full refresh") {
    val v1 = cust.filter(col("c_custkey") % 10 =!= 0)
    val v2 = cust.filter(col("c_custkey") % 13 =!= 1)
      .withColumn("c_acctbal",
        when(col("c_custkey") % 7 === 0, col("c_acctbal") + 100.0)
          .otherwise(col("c_acctbal")))
    val incr = MaterializedView.maintain(
      MaterializedView.refresh(v1, "c_mktsegment", "c_acctbal"),
      v1, v2, "c_custkey", "c_mktsegment", "c_acctbal")
    assert(canon(incr) ===
      canon(MaterializedView.refresh(v2, "c_mktsegment", "c_acctbal")))
  }

  test("chained maintenance v1→v2→v3 stays equal to refresh(v3)") {
    val v1 = cust.filter(col("c_custkey") % 2 === 0)
    val v2 = cust.filter(col("c_custkey") % 3 =!= 0)
    val v3 = cust
    var mv = MaterializedView.refresh(v1, "c_mktsegment", "c_acctbal")
    mv = MaterializedView.maintain(mv, v1, v2, "c_custkey",
      "c_mktsegment", "c_acctbal")
    mv = MaterializedView.maintain(mv, v2, v3, "c_custkey",
      "c_mktsegment", "c_acctbal")
    assert(canon(mv) ===
      canon(MaterializedView.refresh(v3, "c_mktsegment", "c_acctbal")))
  }

  test("a group emptied by the delta disappears, matching refresh") {
    val v1 = cust
    val v2 = cust.filter(col("c_mktsegment") =!= "BUILDING")
    val incr = MaterializedView.maintain(
      MaterializedView.refresh(v1, "c_mktsegment", "c_acctbal"),
      v1, v2, "c_custkey", "c_mktsegment", "c_acctbal")
    assert(incr.filter(col("c_mktsegment") === "BUILDING").count() === 0)
    assert(canon(incr) ===
      canon(MaterializedView.refresh(v2, "c_mktsegment", "c_acctbal")))
  }

  test("an empty delta leaves the MV bit-identical") {
    val v1 = cust
    val mv = MaterializedView.refresh(v1, "c_mktsegment", "c_acctbal")
    val out = MaterializedView.maintain(mv, v1, v1, "c_custkey",
      "c_mktsegment", "c_acctbal")
    assert(canon(out) === canon(mv))
  }
}
