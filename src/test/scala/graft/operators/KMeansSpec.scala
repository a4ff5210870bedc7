package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class KMeansSpec extends SparkSpec {
  import spark.implicits._

  private def v(parts: Double*): Array[Float] =
    parts.map(_.toFloat).toArray

  test("lloyd separates two obvious blobs and recovers their means") {
    // seeds 0,1 land one in each blob; blob A near (1,0), B near (0,1)
    val rows =
      (0 until 10).map(i => (i.toLong * 2, v(1.0 + i * 0.01, 0.0, 0, 0))) ++
      (0 until 10).map(i => (i.toLong * 2 + 1, v(0.0, 1.0 + i * 0.01, 0, 0)))
    val out = KMeans.lloyd(rows.toDF("vec_id", "embedding"),
      "vec_id", "embedding", k = 2, iters = 2).collect()
    assert(out.length == 2)
    val byC = out.map(r => r.getLong(0) -> r).toMap
    assert(byC(0L).getLong(1) == 10L && byC(1L).getLong(1) == 10L)
    // cluster 0 seeded at (1.0,...) → centroid c0 ≈ 1.045 mean
    assert(math.abs(byC(0L).getDouble(3) - 1.045) < 1e-6, s"${byC(0L)}")
    assert(math.abs(byC(1L).getDouble(4) - 1.045) < 1e-6, s"${byC(1L)}")
    // inertia = sum of within-cluster squared distances, small here
    out.foreach(r => assert(r.getDouble(2) < 0.1, s"$r"))
  }

  test("lloyd is deterministic: same input, same centroids and " +
      "inertia, independent of partitioning") {
    val embs = graft.Tables.embeddings(spark, SfDir)
    val a = KMeans.lloyd(embs, "vec_id", "embedding", 4, 2)
      .collect().map(_.toSeq).toSeq
    val b = KMeans.lloyd(embs.repartition(7), "vec_id", "embedding", 4, 2)
      .collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("iterations do not increase inertia (Lloyd's descent property " +
      "up to 6-dp centroid rounding)") {
    val embs = graft.Tables.embeddings(spark, SfDir)
    val i1 = KMeans.lloyd(embs, "vec_id", "embedding", 4, 1)
      .agg(sum("inertia")).head().getDouble(0)
    val i3 = KMeans.lloyd(embs, "vec_id", "embedding", 4, 3)
      .agg(sum("inertia")).head().getDouble(0)
    assert(i3 <= i1 + 1e-3, s"inertia rose: $i1 -> $i3")
  }

  test("an emptied cluster keeps its previous centroid instead of " +
      "vanishing") {
    // seed 1 = far outlier that immediately loses its only point to
    // nothing (it keeps itself); construct: point 1 is alone, all
    // others nearer seed 0 — cluster 1 keeps >= 1 member (the seed
    // itself), so force emptiness via a seed that is closer to seed 0
    // than any point: duplicate coordinates
    val rows = Seq(
      (0L, v(1, 0, 0, 0)), (1L, v(1, 0, 0, 0)), // identical seeds
      (2L, v(1.01, 0, 0, 0)), (3L, v(0.99, 0, 0, 0)))
    val out = KMeans.lloyd(rows.toDF("vec_id", "embedding"),
      "vec_id", "embedding", k = 2, iters = 2).collect()
    // ties all break to cluster 0; cluster 1 empties but still reports
    // its (unchanged) centroid with n_vecs absent from output join
    val c0 = out.find(_.getLong(0) == 0L).get
    assert(c0.getLong(1) == 4L)
    assert(out.length == 1, "empty cluster has no stats row " +
      "(no members), by the groupBy contract")
  }
}
