package graft.table

import java.nio.file.Files

import graft.{SparkSpec, Tables}

class DataLayoutSpec extends SparkSpec {

  test("clusterWrite: disjoint per-file ranges on the cluster key") {
    val dir = Files.createTempDirectory("layout").toString + "/li"
    val li  = Tables.lineitem(spark, SfDir)
    DataLayout.clusterWrite(li, dir, Seq("l_shipdate"), nFiles = 4)

    val back = spark.read.parquet(dir)
    assert(back.count() === li.count())

    // l_shipdate is TIMESTAMP_NTZ → LocalDateTime in external rows
    val toS = (t: java.time.LocalDateTime) =>
      t.toEpochSecond(java.time.ZoneOffset.UTC)
    val ranges = DataLayout.fileRanges(back, "l_shipdate")
      .collect()
      .map(r => (toS(r.getAs[java.time.LocalDateTime](1)),
        toS(r.getAs[java.time.LocalDateTime](2))))
      .sortBy(_._1)
    assert(ranges.length === 4)
    // zone maps must not overlap: file N's max <= file N+1's min
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 <= lo2, s"overlapping file ranges: $hi1 > $lo2")
      case _ =>
    }
  }

  test("bucketWrite: same-bucketed tables join with no exchange") {
    import org.apache.spark.sql.functions._
    DataLayout.bucketWrite(Tables.lineitem(spark, SfDir)
      .select("l_orderkey", "l_extendedprice"),
      "li_bkt", Seq("l_orderkey"), nBuckets = 4)
    DataLayout.bucketWrite(Tables.orders(spark, SfDir)
      .select("o_orderkey", "o_custkey"),
      "o_bkt", Seq("o_orderkey"), nBuckets = 4)
    // force the fact-to-fact (non-broadcastable) scenario bucketing is
    // FOR: with broadcast off, same-bucketed tables SMJ with zero
    // shuffle — the exchange was paid once at layout time
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_bkt")
        .join(spark.table("o_bkt"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(!plan.contains("Exchange"),
        "bucketed-bucketed join still shuffles:\n" + plan)
      // and it is still a correct join
      val expect = Tables.lineitem(spark, SfDir)
        .join(Tables.orders(spark, SfDir),
          col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() === expect)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
