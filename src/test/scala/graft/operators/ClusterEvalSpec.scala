package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ClusterEvalSpec extends SparkSpec {
  import spark.implicits._

  test("tight well-separated clusters score near 1, mixed ones near 0") {
    val good = Seq(
      (1L, 0, Array(0.0f, 0f, 0f, 0f)), (2L, 0, Array(0.1f, 0f, 0f, 0f)),
      (3L, 1, Array(10f, 0f, 0f, 0f)), (4L, 1, Array(10.1f, 0f, 0f, 0f))
    ).toDF("vec_id", "label", "embedding")
    val s = ClusterEval.centroidSilhouette(good, "label", "embedding", 4)
      .collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
    assert(s(0) > 0.99 && s(1) > 0.99, s"separated clusters: $s")

    // interleaved labels: both centroids coincide → silhouette ≈ 0
    val bad = Seq(
      (1L, 0, Array(0.0f, 0f, 0f, 0f)), (2L, 0, Array(10f, 0f, 0f, 0f)),
      (3L, 1, Array(0.0f, 0f, 0f, 0f)), (4L, 1, Array(10f, 0f, 0f, 0f))
    ).toDF("vec_id", "label", "embedding")
    val sb = ClusterEval.centroidSilhouette(bad, "label", "embedding", 4)
      .collect().map(_.getDouble(2))
    assert(sb.forall(v => math.abs(v) < 0.01), s"mixed clusters: ${sb.toSeq}")
  }

  test("fixture labels: silhouette is bounded and deterministic") {
    val embs = graft.Tables.embeddings(spark, SfDir)
    val a = ClusterEval.centroidSilhouette(embs, "label", "embedding",
      graft.SparkEntry.EmbedDim).collect()
    assert(a.length == 10)
    assert(a.forall(r => r.getDouble(2) >= -1.0 && r.getDouble(2) <= 1.0))
    val b = ClusterEval.centroidSilhouette(embs.repartition(7), "label",
      "embedding", graft.SparkEntry.EmbedDim).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq,
      "partitioning must not change the result")
  }

  test("plan: no join against the corpus — centroids ride as literals") {
    val embs = graft.Tables.embeddings(spark, SfDir)
    val plan = ClusterEval.centroidSilhouette(embs, "label", "embedding",
      graft.SparkEntry.EmbedDim).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"silhouette scan must be join-free:\n$plan")
  }
}
