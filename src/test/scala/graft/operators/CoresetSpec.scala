package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CoresetSpec extends SparkSpec {
  import spark.implicits._

  private def toyDF = Seq(
    // three well-separated 2-d-ish groups embedded in 4 dims
    (1L, Array(0.0f, 0.0f, 0f, 0f)), (2L, Array(0.1f, 0.0f, 0f, 0f)),
    (3L, Array(10.0f, 0.0f, 0f, 0f)), (4L, Array(10.1f, 0.0f, 0f, 0f)),
    (5L, Array(0.0f, 10.0f, 0f, 0f)), (6L, Array(0.1f, 10.0f, 0f, 0f))
  ).toDF("vec_id", "embedding")

  test("farthest-point sampling picks one point per separated group") {
    val picks = Coreset.kCenter(toyDF, "vec_id", "embedding", 4, 3)
      .collect().map(_.getLong(1)).toSeq
    assert(picks.head == 1L, "seed is the minimum id")
    // the next two picks must come from the two other groups
    val groups = picks.tail.map { id =>
      if (id <= 2) 0 else if (id <= 4) 1 else 2 }
    assert(groups.toSet == Set(1, 2), s"picks $picks missed a group")
  }

  test("selection distances are non-increasing (greedy max-min)") {
    val embs = graft.Tables.embeddings(spark, SfDir)
    val out = Coreset.kCenter(embs, "vec_id", "embedding",
      graft.SparkEntry.EmbedDim, 6).orderBy("rank").collect()
    val dists = out.drop(1).map(_.getDouble(2))
    assert(dists.sliding(2).forall(w => w(0) >= w(1) - 1e-9),
      s"greedy distances must not increase: ${dists.toSeq}")
  }

  test("assign covers every row within the last selection radius") {
    val embs = graft.Tables.embeddings(spark, SfDir)
    val k = 6
    val picks = Coreset.kCenter(embs, "vec_id", "embedding",
      graft.SparkEntry.EmbedDim, k).orderBy("rank").collect()
    val lastDist = picks.last.getDouble(2)
    val centers = picks.map { r =>
      val id = r.getLong(1)
      val v = embs.filter(col("vec_id") === id)
        .head().getSeq[Float](1).map(_.toDouble).toArray
      (id, v)
    }.toSeq
    val assigned = Coreset.assign(embs, "vec_id", "embedding", centers)
    // 2-approximation property: every point is within the k-th pick's
    // selection distance of SOME center (by the greedy invariant)
    val worst = assigned.agg(max(col("dist"))).head().getDouble(0)
    assert(worst <= lastDist + 1e-6,
      s"coverage radius $worst exceeds last selection dist $lastDist")
    assert(assigned.count() == embs.count())
  }
}
