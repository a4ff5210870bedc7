package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** groupFolds + embargoSplit + dpNoisyCounts (q208/q209/q210). */
class SplitGuardsSpec extends SparkSpec {
  import spark.implicits._

  test("groupFolds keeps every group member in one fold, balanced-ish") {
    val df = (1L to 3000L).map(i => (i, s"g${i % 300}"))
      .toDF("id", "grp")
    val folds = Sampling.groupFolds(df, col("grp"), 5)
    // one fold per group
    assert(folds.groupBy("grp")
      .agg(countDistinct("fold").as("nf"))
      .filter(col("nf") =!= 1).count() == 0)
    // all 5 folds used, none pathologically empty
    val sizes = folds.groupBy("fold").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sizes.keySet == Set(0, 1, 2, 3, 4))
    assert(sizes.values.forall(n => n > 300 && n < 1000), s"skewed: $sizes")
  }

  test("embargoSplit quarantines the gap and keeps order semantics") {
    val events = graft.Tables.events(spark, SfDir)
    val s = Sampling.embargoSplit(events, "ts", 70, 5).cache()
    val byCat = s.groupBy("split").agg(
      min(expr("unix_micros(ts)")).as("lo"),
      max(expr("unix_micros(ts)")).as("hi"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    assert(byCat.keySet == Set("train", "embargo", "test"))
    // strict temporal ordering train < embargo < test
    assert(byCat("train")._2 < byCat("embargo")._1)
    assert(byCat("embargo")._2 < byCat("test")._1)
    // no row lost
    assert(s.count() == events.count())
    // embargo width ≈ 5% of span
    val span = byCat("test")._2 - byCat("train")._1
    val gap = byCat("test")._1 - byCat("embargo")._1
    assert(gap > span / 40 && gap < span / 10,
      s"embargo width $gap vs span $span")
  }

  test("dpNoisyCounts: bounded noise, deterministic, salt-sensitive") {
    val df = (1L to 1000L).map(i => (i, s"g${i % 4}")).toDF("id", "g")
    val a = Privacy.dpNoisyCounts(df, "g", 1.0).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // ε=1, |noise| = |ln(u')| ≤ ln(1e6) ≈ 13.8
    a.foreach { case (_, v) =>
      assert(math.abs(v - 250.0) < 14.0, s"noise out of Laplace range: $v")
    }
    val b = Privacy.dpNoisyCounts(df, "g", 1.0).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(a == b, "same salt must replay identically")
    val c = Privacy.dpNoisyCounts(df, "g", 1.0, salt = "other").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(a != c, "different salt must draw different noise")
    // tighter ε ⇒ larger noise scale: compare expected |noise|
    val wide = Privacy.dpNoisyCounts(df, "g", 0.1).collect()
      .map(r => math.abs(r.getDouble(1) - 250.0)).sum
    val narrow = a.values.map(v => math.abs(v - 250.0)).sum
    assert(wide > narrow, "smaller epsilon must add more noise")
  }
}
