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

  test("knnLabelNoise: a point planted inside another class's cluster " +
      "gets noise_frac 1 and the other class as majority") {
    import spark.implicits._
    // class 0 around (1,0...), class 1 around (0,1...); point 99 is
    // labeled 0 but sits in class 1's cluster
    def v(main: Int, eps: Float) = Array.tabulate(4)(i =>
      if (i == main) 1.0f else if (i == (main + 1) % 4) eps else 0.0f)
    val rows = (1L to 6L).map(id => (id, v(0, id.toFloat / 100), 0)) ++
      (11L to 16L).map(id => (id, v(1, id.toFloat / 100), 1)) :+
      ((99L, v(1, 0.05f), 0))
    val df = rows.toDF("vec_id", "embedding", "label")
    val out = ClusterEval.knnLabelNoise(df, "vec_id", "embedding",
      "label", col("vec_id") === 99L, k = 4).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(0) == 99L && r.getInt(1) == 0)
    assert(r.getDouble(4) == 1.0, s"$r")
    assert(r.getInt(5) == 1)
  }

  test("knnLabelNoise: a well-placed point has zero disagreement; " +
      "the probe never counts itself as a neighbor") {
    import spark.implicits._
    def v(main: Int, eps: Float) = Array.tabulate(4)(i =>
      if (i == main) 1.0f else if (i == (main + 1) % 4) eps else 0.0f)
    val rows = (1L to 6L).map(id => (id, v(0, id.toFloat / 100), 0)) ++
      (11L to 16L).map(id => (id, v(1, id.toFloat / 100), 1))
    val df = rows.toDF("vec_id", "embedding", "label")
    val out = ClusterEval.knnLabelNoise(df, "vec_id", "embedding",
      "label", col("vec_id") === 3L, k = 5).collect().head
    assert(out.getLong(2) == 5L && out.getLong(3) == 0L
      && out.getDouble(4) == 0.0, s"$out")
  }
}
