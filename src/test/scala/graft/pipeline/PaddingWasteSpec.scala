package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PaddingWasteSpec extends SparkSpec {
  import spark.implicits._

  test("buckets, truncation and the pad-to-max row are computed exactly") {
    val docs = Seq(
      (1L, "a b c"),                              // 3 tokens  → bucket 8
      (2L, ("w " * 10).trim),                     // 10 tokens → bucket 16
      (3L, ("x " * 40).trim),                     // 40 > 32 → trunc, bucket 32
      (4L, "")                                    // 0 tokens  → bucket 8
    ).toDF("doc_id", "text")
    val out = Packing.paddingWaste(docs, "text", granularity = 8,
        maxLen = 32)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5))).toMap
    // bucket 8: docs 1 and 4 → real 3, padded 16
    assert(out(8L) == (2L, 3L, 0L, 16L, 0.8125))
    // bucket 16: doc 2 → real 10, padded 16
    assert(out(16L) == (1L, 10L, 0L, 16L, 0.375))
    // bucket 32: doc 3 truncated 40 → 32, padded 32, waste 0
    assert(out(32L) == (1L, 32L, 1L, 32L, 0.0))
    // pad-to-max: 4 docs × 32 = 128 padded, real 45; waste is
    // TRUNCATED integer ppm (83000000 div 128 = 648437)
    assert(out(-1L) == (4L, 45L, 1L, 128L, 0.648437))
  }

  test("bucketing never wastes more than pad-to-max") {
    val docs = graft.Tables.documents(spark, SfDir)
    val out = Packing.paddingWaste(docs, "text", 16, 64).collect()
    val padMax = out.find(_.getLong(0) == -1L).get.getDouble(5)
    val bucketed = out.filter(_.getLong(0) != -1L)
    val totReal = bucketed.map(_.getLong(2)).sum
    val totPad  = bucketed.map(_.getLong(4)).sum
    val overall = (totPad - totReal).toDouble / totPad
    assert(overall <= padMax,
      s"bucketed waste $overall must not exceed pad-to-max $padMax")
  }

  test("single fixed-cardinality aggregation: one shuffle, no window") {
    val docs = graft.Tables.documents(spark, SfDir)
    val plan = Packing.paddingWaste(docs, "text", 16, 64)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"paddingWaste must not window:\n$plan")
  }
}
