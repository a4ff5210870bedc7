package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CausalSpec extends SparkSpec {
  import spark.implicits._

  test("stratifiedEffect: hand-computed strata and ATE") {
    // stratum A: treat {10, 12} control {8}; stratum B: treat {3}
    // control {1, 1}. diffs: A = 11-8 = 3, B = 3-1 = 2.
    // ATE = (3/6)*3 + (3/6)*2 = 2.5
    val df = Seq(
      ("A", 0L, 10.0), ("A", 2L, 12.0), ("A", 1L, 8.0),
      ("B", 4L, 3.0), ("B", 3L, 1.0), ("B", 5L, 1.0)
    ).toDF("s", "uid", "y")
    val out = Causal.stratifiedEffect(df, "s", col("uid") % 2 === 0, "y")
      .orderBy("stratum").collect()
    val byName = out.map(r => r.getString(0) -> r).toMap
    val ate = byName("__ate")
    assert(ate.getLong(1) == 6L && ate.getLong(2) == 3L
      && ate.getDouble(5) == 2.5, s"${out.toSeq}")
    val a = byName("A")
    assert(a.getDouble(3) == 11.0
      && a.getDouble(4) == 8.0 && a.getDouble(5) == 3.0)
    assert(byName("B").getDouble(5) == 2.0)
  }

  test("stratifiedEffect undoes Simpson's paradox: raw pooled diff has " +
      "the opposite sign of every within-stratum diff") {
    // classic construction: treatment concentrates in the low-outcome
    // stratum, so the POOLED treated mean is lower even though
    // treatment helps within each stratum
    val rows =
      Seq.fill(8)(("low", 0L, 2.0)) ++ Seq.fill(2)(("low", 1L, 1.0)) ++
      Seq.fill(2)(("high", 0L, 11.0)) ++ Seq.fill(8)(("high", 1L, 10.0))
    val df = rows.toDF("s", "uid", "y")
    val treat = col("uid") % 2 === 0
    // pooled (unstratified) diff: treated mean < control mean
    val pooled = df.groupBy(treat.as("t"))
      .agg(avg("y").as("m")).collect()
      .map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(pooled(true) < pooled(false))
    // stratified ATE is positive (+1 in each stratum)
    val ate = Causal.stratifiedEffect(df, "s", treat, "y")
      .filter(col("stratum") === "__ate").collect().head.getDouble(5)
    assert(ate == 1.0, s"ate=$ate")
  }

  test("stratifiedEffect: a stratum with an empty arm reports null " +
      "diff and is excluded from the ATE weighting") {
    val df = Seq(
      ("A", 0L, 10.0), ("A", 1L, 8.0),
      ("C", 1L, 100.0) // control-only stratum: unidentified
    ).toDF("s", "uid", "y")
    val out = Causal.stratifiedEffect(df, "s", col("uid") % 2 === 0, "y")
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(5)) None else Some(r.getDouble(5)))).toMap
    assert(out("C").isEmpty)
    assert(out("__ate").contains(2.0)) // only A identifies: 10-8
  }
}
