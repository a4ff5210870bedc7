package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ProjectionSpec extends SparkSpec {
  import spark.implicits._

  test("signMatrix is deterministic ±1 and roughly balanced") {
    val s = Projection.signMatrix(spark.range(1).toDF(), 64, 16)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    assert(s.length == 64 * 16)
    assert(s.forall { case (_, v) => v == 1.0 || v == -1.0 })
    val plus = s.count(_._2 == 1.0).toDouble / s.length
    assert(plus > 0.4 && plus < 0.6, s"sign balance $plus")
    // determinism: same (i, j) → same sign on a fresh build
    val again = Projection.signMatrix(spark.range(1).toDF(), 64, 16)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
      .toMap
    s.foreach { case (k, v) => assert(again(k) == v) }
  }

  test("jlProject: a one-hot input vector reproduces (sign row)/√k") {
    val oneHot = Array.tabulate(8)(i => if (i == 3) 1.0f else 0.0f)
    val df = Seq((1L, oneHot)).toDF("id", "vec")
    val p = Projection.jlProject(df, "id", "vec", 8, 4)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    val signs = Projection.signMatrix(df, 8, 4)
      .filter(col("i") === 3).collect()
      .map(r => r.getLong(1) -> r.getDouble(2)).toMap
    (0L until 4L).foreach { j =>
      val exp = BigDecimal(signs(j) / math.sqrt(4.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(p(j) == exp, s"j=$j ${p(j)} vs $exp")
    }
  }

  test("jlProject preserves squared norms in expectation (JL property " +
      "on the fixture corpus, loose band)") {
    val emb = graft.Tables.embeddings(spark, SfDir).limit(64)
    val orig = emb.select(col("vec_id"),
        aggregate(col("embedding"), lit(0.0d),
          (acc, x) => acc + x.cast("double") * x.cast("double")).as("n2"))
    val proj = Projection.jlProject(emb, "vec_id", "embedding", 64, 16)
      .groupBy("vec_id").agg(sum(col("p") * col("p")).as("p2"))
    val ratios = orig.join(proj, "vec_id")
      .select((col("p2") / col("n2")).as("r")).collect().map(_.getDouble(0))
    val mean = ratios.sum / ratios.length
    // E[ratio] = 1; k=16 gives wide per-vector spread but a tight mean
    assert(mean > 0.8 && mean < 1.2, s"mean ratio $mean")
    assert(ratios.forall(r => r > 0.2 && r < 3.0),
      s"extreme distortion: ${ratios.min} .. ${ratios.max}")
  }
}
