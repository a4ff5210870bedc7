package graft.pipeline

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class PackingSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, SfDir)

  test("layout is a partition of the corpus with per-shard contiguous offsets") {
    val lay = packed()
    assert(lay.count() === docs.count())
    // per shard: offsets start at 0 and each start_off equals the sum of
    // preceding docs' tokens (contiguous concatenation, no gaps)
    val bad = lay.groupBy("shard")
      .agg(min("start_off").as("mn"),
        max(col("start_off") + col("n_tokens")).as("end"),
        sum("n_tokens").as("tot"))
      .filter(col("mn") =!= 0 || col("end") =!= col("tot"))
    assert(bad.count() === 0)
  }

  test("sequence ids follow from offsets; split flag matches boundary crossing") {
    val lay = packed()
    val bad = lay.filter(
      col("seq_first") =!= expr("start_off div 64") ||
      (col("n_tokens") > 0 &&
        col("seq_last") =!= expr("(start_off + n_tokens - 1) div 64")))
    assert(bad.count() === 0)
  }

  test("stats reconcile with the layout") {
    val stats = Packing.packStats(docs, "doc_id", "text", 8, 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    val tot = stats.map(_._2).sum
    assert(tot === docs.count())
    stats.foreach { case (_, _, tokens, nSeqs, _) =>
      assert(nSeqs === (tokens + 63) / 64)
    }
  }

  test("a new salt is a new epoch layout (different shard assignment)") {
    val a = packed().select("doc_id", "shard")
    val b = Packing.packedLayout(docs, "doc_id", "text", 8, 64,
      salt = "epoch1").select("doc_id", "shard")
    val moved = a.join(b.withColumnRenamed("shard", "shard2"), "doc_id")
      .filter(col("shard") =!= col("shard2")).count()
    assert(moved > 0)
  }

  test("the only window is partitioned by shard — no global running state") {
    val plan = packed().queryExecution.optimizedPlan.toString
    assert(plan.contains("windowspecdefinition(shard"), plan)
  }

  private def packed() =
    Packing.packedLayout(docs, "doc_id", "text", 8, 64)
}
