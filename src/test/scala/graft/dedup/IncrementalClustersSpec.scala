package graft.dedup

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class IncrementalClustersSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, SfDir)

  private def labelsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq

  test("incremental maintenance equals full recompute, label for label") {
    val old   = docs.filter(col("doc_id") % 3 =!= 0)
    val batch = docs.filter(col("doc_id") % 3 === 0)
    val oldLabels = Dedup.nearDupClusters(old, "doc_id",
      Dedup.minhashCandidatePairs(old, "doc_id", "text"))
    val idx = Dedup.minhashBandIndex(old, "doc_id", "text")
    val newPairs = Dedup
      .incrementalCandidatePairs(idx, batch, "doc_id", "text")
      .unionByName(Dedup.minhashCandidatePairs(batch, "doc_id", "text"))
    val incr = Dedup.incrementalClusters(oldLabels, "doc_id",
      batch.select("doc_id"), newPairs)
    val full = Dedup.nearDupClusters(docs, "doc_id",
      Dedup.minhashCandidatePairs(docs, "doc_id", "text"))
    assert(labelsOf(incr) === labelsOf(full))
  }

  test("a batch with no pairs leaves every old label unchanged and self-labels the batch") {
    import spark.implicits._
    val old = docs.limit(50)
    val oldLabels = Dedup.nearDupClusters(old, "doc_id",
      Dedup.minhashCandidatePairs(old, "doc_id", "text"))
    val batchIds = Seq(900001L, 900002L).toDF("doc_id")
    val empty = spark.emptyDataset[(Long, Long)].toDF("a", "b")
    val incr = Dedup.incrementalClusters(oldLabels, "doc_id",
      batchIds, empty)
    assert(labelsOf(incr.filter(col("doc_id") < 900000L)) ===
      labelsOf(oldLabels))
    assert(labelsOf(incr.filter(col("doc_id") >= 900000L)) ===
      Seq((900001L, 900001L), (900002L, 900002L)))
  }

  test("a pair merging two old clusters resolves both to the global min") {
    import spark.implicits._
    // two clusters {1,2} (label 1) and {5,6} (label 5); batch doc 9
    // links 2 and 6 transitively
    val oldLabels = Seq((1L, 1L), (2L, 1L), (5L, 5L), (6L, 5L), (8L, 8L))
      .toDF("doc_id", "cluster_id")
    val batch = Seq(9L).toDF("doc_id")
    val pairs = Seq((2L, 9L), (9L, 6L)).toDF("a", "b")
    val incr = Dedup.incrementalClusters(oldLabels, "doc_id", batch,
      pairs)
    val got = labelsOf(incr)
    assert(got === Seq((1L, 1L), (2L, 1L), (5L, 1L), (6L, 1L), (8L, 8L),
      (9L, 1L)))
  }
}
