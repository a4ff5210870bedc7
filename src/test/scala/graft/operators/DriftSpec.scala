package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class DriftSpec extends SparkSpec {

  test("identical reference and current slices give PSI ≈ 0") {
    val ev = Tables.events(spark, SfDir).select(col("value"))
      .withColumn("flip", monotonically_increasing_id() % 2 === 0)
    // same distribution on both sides (alternating assignment)
    val psi = Drift.psiBins(ev, "value", col("flip"))
      .agg(sum("psi_bin")).head().getDouble(0)
    assert(math.abs(psi) < 0.05, s"psi $psi should be ~0 on a null split")
  }

  test("a location shift drives PSI far above the 0.25 alarm bar") {
    val ev = Tables.events(spark, SfDir).select(col("value"))
      .withColumn("is_ref", monotonically_increasing_id() % 2 === 0)
      .withColumn("value",
        when(col("is_ref"), col("value")).otherwise(col("value") * 3 + 500))
    val psi = Drift.psiBins(ev, "value", col("is_ref"))
      .agg(sum("psi_bin")).head().getDouble(0)
    assert(psi > 0.25, s"psi $psi should alarm on a shifted current slice")
  }

  test("bins partition both slices completely") {
    val ev = Tables.events(spark, SfDir).select(col("value"))
      .withColumn("is_ref", col("value") <= 250)
    val bins = Drift.psiBins(ev, "value", col("is_ref"))
    val total = bins.agg(sum(col("ref_n") + col("cur_n"))).head().getLong(0)
    assert(total === ev.count())
    assert(bins.filter(col("bin") < 1 || col("bin") > 10).count() === 0)
  }

  test("an EMPTY current slice yields a defined psi and n_rows=0 — the gate can fail closed") {
    val ev = Tables.events(spark, SfDir).select(col("value"))
    val (edges, props) = Drift.referenceProfile(ev, "value")
    val r = Drift.psiAgainstReference(
      ev.filter(lit(false)), "value", edges, props).head()
    assert(r.getAs[Long]("n_rows") === 0L)
    assert(!r.isNullAt(r.fieldIndex("psi")),
      "psi must be defined (smoothed) on an empty slice, not NULL")
  }

  test("jsDivergence: identical category distributions give exactly 0") {
    import spark.implicits._
    // both halves see the same lang multiset
    val rows = Seq("en", "en", "fr", "de").flatMap(l =>
      Seq((l, 0L), (l, 1L)))
    val r = Drift.jsDivergence(rows.toDF("lang", "half"),
      "lang", col("half") === 0L).head()
    assert(r.getDouble(2) == 0.0 && r.getDouble(3) == 0.0, s"$r")
  }

  test("jsDivergence: disjoint supports saturate at ln 2 (js_norm = 1) " +
      "with no smoothing artifacts on the zero cells") {
    import spark.implicits._
    val rows = Seq(("en", 0L), ("en", 0L), ("fr", 1L), ("de", 1L))
    val r = Drift.jsDivergence(rows.toDF("lang", "half"),
      "lang", col("half") === 0L).head()
    assert(r.getDouble(3) == 1.0, s"$r")
    val exp = BigDecimal(math.log(2.0)).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(2) == exp)
  }

  test("jsDivergence is symmetric in the two slices") {
    import spark.implicits._
    val rows = Seq(("a", 0L), ("a", 0L), ("b", 0L), ("a", 1L),
      ("b", 1L), ("b", 1L), ("c", 1L))
    val df = rows.toDF("k", "half")
    val fwd = Drift.jsDivergence(df, "k", col("half") === 0L).head()
    val rev = Drift.jsDivergence(df, "k", col("half") === 1L).head()
    assert(fwd.getDouble(2) == rev.getDouble(2), s"$fwd vs $rev")
  }
}
