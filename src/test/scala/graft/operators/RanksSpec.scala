package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RanksSpec extends SparkSpec {
  import spark.implicits._

  test("globalRowNumber equals the single-window row_number") {
    val events = graft.Tables.events(spark, SfDir)
      .filter(col("user_id") < 20).select("event_id", "value")
    val fast = Ranks.globalRowNumber(events, "value", "event_id")
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSeq
    val slow = events.withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("value"), col("event_id"))).cast("long"))
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(fast == slow)
  }

  test("ranking plan has no corpus-wide window: every window " +
      "partitions by bucket or runs on the metadata grid") {
    val events = graft.Tables.events(spark, SfDir)
      .select("event_id", "value")
    val df = Ranks.globalRowNumber(events, "value", "event_id")
    // the local window is partitioned by __b; the only unpartitioned
    // window is the ≤1024-row grid prefix. Pin: the row-level window
    // node mentions the bucket column.
    val plan = df.queryExecution.optimizedPlan.toString
    val windows = plan.split("\n").filter(_.contains("windowspec"))
    assert(windows.exists(_.contains("__b")),
      s"local rank window must partition by bucket:\n$plan")
  }

  test("mannWhitney: identical groups give z ~ 0, shifted groups " +
      "a large |z|, matching a driver-side reference") {
    // group a ~ uniform, group b = a + shift
    val same = ((1 to 500).map(i => (i % 97 * 1.0, "a")) ++
      (1 to 500).map(i => (i % 97 * 1.0, "b"))).toDF("v", "g")
    val zSame = Ranks.mannWhitney(same, "v", "g", "a", "b")
      .head().getDouble(3)
    assert(math.abs(zSame) < 0.05, s"identical groups z=$zSame")

    val shifted = ((1 to 500).map(i => (i % 97 * 1.0, "a")) ++
      (1 to 500).map(i => (i % 97 * 1.0 + 50.0, "b"))).toDF("v", "g")
    val zShift = Ranks.mannWhitney(shifted, "v", "g", "a", "b")
      .head().getDouble(3)
    assert(zShift < -5.0, s"a below b must give strongly negative z, got $zShift")
  }

  test("spearman: monotone relation 1, reversed -1, independent ~0") {
    val mono = (1 to 200).map(i => (i.toDouble, i * i.toDouble))
      .toDF("x", "y")
    assert(Ranks.spearman(mono, "x", "y").head().getDouble(1) == 1.0)
    val rev = (1 to 200).map(i => (i.toDouble, -i.toDouble)).toDF("x", "y")
    assert(Ranks.spearman(rev, "x", "y").head().getDouble(1) == -1.0)
    val ind = (1 to 2000).map(i => (i.toDouble, (i * 7919 % 2003).toDouble))
      .toDF("x", "y")
    assert(math.abs(Ranks.spearman(ind, "x", "y").head().getDouble(1)) < 0.1)
  }

  test("spearman with ties matches the closed-form small case") {
    // x = (1,2,2,3), y = (10,20,20,40): tie-averaged ranks are
    // identical across both columns → rho = 1
    val df = Seq((1.0, 10.0), (2.0, 20.0), (2.0, 20.0), (3.0, 40.0))
      .toDF("x", "y")
    assert(Ranks.spearman(df, "x", "y").head().getDouble(1) == 1.0)
  }

  test("kappa: perfect agreement 1, chance-level 0, ppm-exact rates") {
    import graft.pipeline.WeakLabels
    val perfect = (1 to 100).map(i => (i % 3, i % 3)).toDF("a", "b")
    val kp = WeakLabels.kappa(perfect, col("a"), col("b")).head()
    assert(kp.getDouble(3) == 1.0)
    // b independent of a with identical marginals → kappa ≈ 0
    val chance = (0 until 900).map(i => (i % 3, (i / 3) % 3)).toDF("a", "b")
    val kc = WeakLabels.kappa(chance, col("a"), col("b")).head()
    assert(math.abs(kc.getDouble(3)) < 0.01, s"chance kappa ${kc.getDouble(3)}")
    // p_o/p_e are truncated-ppm ratios
    assert(kc.getDouble(1) == (300L * 1000000L / 900L).toDouble / 1e6)
  }

  test("mannWhitney tie handling matches the textbook small case") {
    // A = {1, 2, 2}, B = {2, 3}: ranks 1, avg(2,3,4)=3, 3, 3, 5
    // R_a = 1 + 3 + 3 = 7; U_a = 7 - 3*4/2 = 1
    val df = Seq((1.0, "a"), (2.0, "a"), (2.0, "a"), (2.0, "b"),
      (3.0, "b")).toDF("v", "g")
    val r = Ranks.mannWhitney(df, "v", "g", "a", "b").head()
    assert(r.getLong(0) == 3 && r.getLong(1) == 2)
    assert(r.getDouble(2) == 1.0, s"U_a = ${r.getDouble(2)}")
  }
}
