package graft.operators

import graft.SparkSpec

class IntervalsSpec extends SparkSpec {
  import spark.implicits._

  test("peakConcurrency: textbook staircase — peak at the 3-way " +
      "overlap, earliest attaining instant reported") {
    // [0,10], [5,15], [8,12] → 3 concurrent over [8,10]; [20,25] alone
    val df = Seq((0L, 10L), (5L, 15L), (8L, 12L), (20L, 25L))
      .toDF("s", "e")
    val r = Intervals.peakConcurrency(df, "s", "e").collect().head
    assert(r.getLong(0) == 4L && r.getLong(1) == 3L
      && r.getLong(2) == 8L, s"$r")
  }

  test("peakConcurrency: end-inclusive touching counts as overlap, " +
      "but end+1 does not") {
    val touching = Seq((0L, 5L), (5L, 9L)).toDF("s", "e")
    assert(Intervals.peakConcurrency(touching, "s", "e")
      .collect().head.getLong(1) == 2L)
    val disjoint = Seq((0L, 5L), (6L, 9L)).toDF("s", "e")
    assert(Intervals.peakConcurrency(disjoint, "s", "e")
      .collect().head.getLong(1) == 1L)
  }

  test("peakConcurrency: an expiring interval never transiently " +
      "stacks with one starting the next second") {
    // [0,4] ends at 4; [5,9] starts at 5 → peak must be 1
    val df = Seq((0L, 4L), (5L, 9L)).toDF("s", "e")
    assert(Intervals.peakConcurrency(df, "s", "e")
      .collect().head.getLong(1) == 1L)
  }

  test("peakConcurrency matches the single-window reference on " +
      "fixture spans, independent of bucketing") {
    import org.apache.spark.sql.functions._
    val sec = unix_timestamp(date_trunc("second", col("ts")))
    val spans = graft.Tables.events(spark, SfDir)
      .select(col("user_id"), sec.as("sv"))
      .groupBy("user_id").agg(min("sv").as("t0"), max("sv").as("t1"))
      .localCheckpoint(true)
    val fast = Intervals.peakConcurrency(spans, "t0", "t1")
      .collect().head
    val slow = Intervals.peakConcurrency(spans, "t0", "t1", nBuckets = 7)
      .collect().head
    assert(fast.toSeq == slow.toSeq)
  }
}
