package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class EmbeddingAuditSpec extends SparkSpec {
  import spark.implicits._

  test("centroidShift: identical snapshots shift exactly +0.0; a " +
      "hand-computed split matches; empty side drops the group") {
    // group "a": old {(0,0),(2,2)} mean (1,1); new {(4,0),(0,0)} mean
    // (2,0) -> shift² = 1 + 1 = 2
    val df = Seq(
      (0L, Seq(0.0f, 0.0f), "a"), (2L, Seq(2.0f, 2.0f), "a"),
      (1L, Seq(4.0f, 0.0f), "a"), (3L, Seq(0.0f, 0.0f), "a"),
      (4L, Seq(1.0f, 1.0f), "b"), (5L, Seq(1.0f, 1.0f), "b"),
      (6L, Seq(7.0f, 7.0f), "c") // old only: no new snapshot -> dropped
    ).toDF("vec_id", "embedding", "grp")
    val got = EmbeddingAudit.centroidShift(df, "embedding", 2, "grp",
      col("vec_id") % 2 === 0)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got("a") == ((2L, 2L, 2.0)))
    val (nb1, nb2, zb) = got("b")
    assert(nb1 == 1L && nb2 == 1L && zb == 0.0)
    assert(java.lang.Double.doubleToRawLongBits(zb) == 0L,
      "zero shift must be POSITIVE zero (the q201 signed-zero lesson)")
    assert(!got.contains("c"))
  }

  test("sq8ReconstructionError: constant dims reconstruct exactly; " +
      "a 2-level dim is exact at the endpoints; mid values bounded " +
      "by half a quantization step") {
    val vals = Seq(0.0f, 1.0f, 0.5f, 0.25f)
    val df = vals.zipWithIndex
      .map { case (v, i) => (i.toLong, Seq(3.0f, v)) }
      .toDF("vec_id", "embedding")
    val got = EmbeddingAudit.sq8ReconstructionError(df, "embedding")
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    // dim 0 constant -> lo = hi = 3, mse +0.0
    val (n0, lo0, hi0, mse0) = got(0)
    assert(n0 == 4L && lo0 == 3.0 && hi0 == 3.0 && mse0 == 0.0)
    assert(java.lang.Double.doubleToRawLongBits(mse0) == 0L)
    // dim 1 spans [0, 1]: endpoints land on codes 0/255 exactly; every
    // value's error is at most half a step (1/255/2)
    val (n1, lo1, hi1, mse1) = got(1)
    assert(n1 == 4L && lo1 == 0.0 && hi1 == 1.0)
    val halfStep = 1.0 / 255.0 / 2.0
    assert(mse1 > 0.0 && mse1 <= halfStep * halfStep, s"mse=$mse1")
  }

  test("centroidShift is partition-invariant (exact integer moments)") {
    val embs = graft.Tables.embeddings(spark, SfDir)
    def run(df: org.apache.spark.sql.DataFrame) =
      EmbeddingAudit.centroidShift(df, "embedding",
        graft.SparkEntry.EmbedDim, "label", col("vec_id") % 2 === 0)
        .collect().map(_.toString).toSeq
    assert(run(embs.repartition(1)) == run(embs.repartition(17)))
  }
}
