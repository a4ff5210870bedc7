package graft.table

import java.nio.file.Files

import org.apache.spark.sql.functions._

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

  test("zInterleave: known Morton codes, per-dim monotone") {
    import spark.implicits._
    val df = Seq((3L, 5L), (0L, 0L), (1L, 1L), (7L, 0L), (0L, 7L))
      .toDF("a", "b")
      .select(DataLayout.zInterleave(col("a"), col("b")).as("z"))
    val z = df.as[Long].collect()
    // interleave(3=0b011, 5=0b101): bits a→even, b→odd:
    // a: 1·2^0 + 1·2^2 ; b: 1·2^1 + 1·2^5 = 1+4+2+32 = 39
    assert(z(0) === 39L)
    assert(z(1) === 0L)
    assert(z(2) === 3L)   // 1 + 2
    // monotone in each dim with the other fixed at 0
    assert(z(3) > z(2) && z(4) > z(2))
  }

  test("zorderWrite: files cover compact rectangles — both dims prune") {
    import spark.implicits._
    // a 64x64 grid: linear clustering on x gives full-height slabs
    // (y-range = everything in every file); z-order must bound BOTH dims
    val grid = (for { x <- 0 until 64; y <- 0 until 64 }
      yield (x.toLong, y.toLong)).toDF("x", "y")
    val dir = Files.createTempDirectory("zorder").toString + "/g"
    DataLayout.zorderWrite(grid, dir, "x", "y", nFiles = 16)
    val back = spark.read.parquet(dir)
    assert(back.count() === 64L * 64L)
    val spans = back.groupBy(input_file_name())
      .agg(min("x").as("x0"), max("x").as("x1"),
        min("y").as("y0"), max("y").as("y1"))
      .collect()
      .map(r => (r.getLong(2) - r.getLong(1), r.getLong(4) - r.getLong(3)))
    assert(spans.length === 16)
    // every file's rectangle is a fraction of the 63-wide domain in BOTH
    // dims (16 files over a 2D grid → ~16x16 tiles; allow slack for
    // range-partition boundaries landing mid-tile)
    spans.foreach { case (dx, dy) =>
      assert(dx <= 32, s"x-span $dx not compact")
      assert(dy <= 32, s"y-span $dy not compact")
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
