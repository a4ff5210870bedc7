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
}
