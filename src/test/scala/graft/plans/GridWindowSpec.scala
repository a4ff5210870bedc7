package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Scale-shape pins for the round-7 grid operators: every ROW-LEVEL
  * window must partition by a bucket key (`__b` / `__rb`) — the
  * bucketed-prefix discipline — so no corpus-sized partition ever
  * funnels into one task. Windows over METADATA frames (the bucket
  * grid itself, the calendar-day grid, probe partitions) are the
  * documented exceptions and are not matched by these patterns. */
class GridWindowSpec extends SparkSpec {

  private def rowWindowsBucketed(df: DataFrame, corpusKeys: Seq[String])
      : Unit = {
    val plan = df.queryExecution.optimizedPlan.toString
    val rowWindows = plan.split("\n").filter(_.contains("windowspec"))
    corpusKeys.foreach { k =>
      assert(rowWindows.forall(w => !w.contains(s"windowspec($k#")
          || w.contains("__b") || w.contains("__rb")),
        s"window partitioned by corpus key $k without a bucket:\n$plan")
    }
  }

  test("conformal thresholds: per-value windows ride (group, bucket)") {
    val docs = graft.Tables.documents(spark, SfDir)
      .select(col("lang"), col("n_chars").cast("double").as("score"))
    rowWindowsBucketed(
      graft.operators.Conformal.thresholds(docs, "lang", "score", 0.1),
      Seq("g"))
  }

  test("decision stump: cumulative class counts ride the bucket key") {
    rowWindowsBucketed(
      graft.operators.Stump.bestSplit(
        graft.Tables.documents(spark, SfDir), "n_chars",
        col("lang") === "en"),
      Seq("v"))
  }

  test("average precision: rank and positive prefixes ride buckets") {
    rowWindowsBucketed(
      graft.operators.Ranks.averagePrecision(
        graft.Tables.documents(spark, SfDir), "n_chars", "doc_id",
        col("lang") === "en"),
      Seq("__negs", "rank"))
  }

  test("peak concurrency: the running sum rides the time bucket") {
    val sec = unix_timestamp(date_trunc("second", col("ts")))
    val spans = graft.Tables.events(spark, SfDir)
      .select(col("user_id"), sec.as("sv"))
      .groupBy("user_id").agg(min("sv").as("t0"), max("sv").as("t1"))
    rowWindowsBucketed(
      graft.operators.Intervals.peakConcurrency(spans, "t0", "t1"),
      Seq("t"))
  }

  test("jackknife ratio plans with no window at all (pure aggregates " +
      "over the bucket frame)") {
    val orders = graft.Tables.orders(spark, SfDir)
      .select(col("o_custkey"), col("o_totalprice"), lit(1.0).as("one"))
    val plan = graft.operators.Resample.jackknifeRatio(orders,
      "o_custkey", "o_totalprice", "one")
      .queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("window"),
      s"jackknife must be window-free:\n$plan")
  }
}
