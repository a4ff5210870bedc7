package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

class EpochMixtureSpec extends SparkSpec {
  import spark.implicits._

  test("integer epochs replicate exactly, zero drops, fraction admits ppm") {
    val df = (1L to 1000L).map(i => (i, if (i <= 400) 2.0
      else if (i <= 800) 0.5 else 0.0)).toDF("id", "eps")
    val out = Sampling.epochMixture(df, "id", col("eps")).cache()
    // eps = 2.0 → exactly two copies, epochs 1 and 2
    val twos = out.filter(col("eps") === 2.0)
    assert(twos.count() == 800)
    assert(twos.groupBy("id").count().filter(col("count") =!= 2).count() == 0)
    assert(twos.agg(max("epoch")).head().getInt(0) == 2)
    // eps = 0.0 → dropped
    assert(out.filter(col("eps") === 0.0).count() == 0)
    // eps = 0.5 → ≈ half admitted, all with epoch 1
    val halves = out.filter(col("eps") === 0.5)
    val n = halves.count()
    assert(n > 120 && n < 280, s"0.5-epoch admission $n far from 200")
    assert(halves.filter(col("epoch") =!= 1).count() == 0)
  }

  test("deterministic and idempotent: same plan, same rows") {
    val df = (1L to 500L).map(i => (i, 1.7)).toDF("id", "eps")
    val a = Sampling.epochMixture(df, "id", col("eps"))
      .orderBy("id", "epoch").collect().toSeq
    val b = Sampling.epochMixture(df.repartition(7), "id", col("eps"))
      .orderBy("id", "epoch").collect().toSeq
    assert(a == b, "partitioning must not change the admitted copy set")
  }

  test("expected token mass tracks Σ epochs within ppm tolerance") {
    val df = (1L to 2000L).map(i => (i, 1.25)).toDF("id", "eps")
    val out = Sampling.epochMixture(df, "id", col("eps")).count()
    // E[count] = 2000 * 1.25 = 2500; binomial(2000, .25) sd ≈ 19
    assert(math.abs(out - 2500L) < 100, s"materialized $out vs expected 2500")
  }

  test("map-only plan: no shuffle exchange") {
    val df = (1L to 100L).map(i => (i, 1.5)).toDF("id", "eps")
    val plan = Sampling.epochMixture(df, "id", col("eps"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"epochMixture must not shuffle:\n$plan")
  }
}
