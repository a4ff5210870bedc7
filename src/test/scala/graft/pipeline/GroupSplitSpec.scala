package graft.pipeline

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.dedup.Dedup

class GroupSplitSpec extends SparkSpec {

  test("no group ever spans the split boundary") {
    val docs = Tables.documents(spark, SfDir)
    val clusters = Dedup.nearDupClusters(docs, "doc_id",
      Dedup.minhashCandidatePairs(docs, "doc_id", "text"))
    val split = Sampling.groupSplit(docs.join(clusters, "doc_id"),
      col("cluster_id"), 0.8)
    val spanning = split.groupBy("cluster_id")
      .agg(countDistinct("split").as("sides"))
      .filter(col("sides") > 1)
    assert(spanning.count() === 0)
    // both sides populated at the fixture's cluster count
    assert(split.select("split").distinct().count() === 2)
  }

  test("per-doc hash splitting DOES leak dup pairs — the failure groupSplit prevents") {
    val docs = Tables.documents(spark, SfDir)
    val pairs = Dedup.minhashCandidatePairs(docs, "doc_id", "text")
    val byDoc = Sampling.groupSplit(docs, col("doc_id"), 0.8)
      .select(col("doc_id"), col("split"))
    val leaked = pairs
      .join(byDoc.toDF("a", "split_a"), "a")
      .join(byDoc.toDF("b", "split_b"), "b")
      .filter(col("split_a") =!= col("split_b"))
    assert(leaked.count() > 0,
      "fixture should demonstrate the leak that group-splitting closes")
  }
}
