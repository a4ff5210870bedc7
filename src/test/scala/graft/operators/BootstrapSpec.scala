package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class BootstrapSpec extends SparkSpec {

  test("CI brackets the point estimate and is proper") {
    val r = Bootstrap.meanCi(Tables.events(spark, SfDir),
      "event_id", "value").head()
    val (mean, lo, hi) = (r.getAs[Double]("mean"),
      r.getAs[Double]("ci_lo"), r.getAs[Double]("ci_hi"))
    assert(lo < hi)
    assert(lo <= mean && mean <= hi,
      s"mean $mean outside [$lo, $hi]")
    // Poisson-bootstrap SE of a mean ≈ sd/√n: the interval must be
    // narrow at n≈6k, not degenerate and not vacuous
    assert(hi - lo > 0.0 && hi - lo < mean)
  }

  test("the CI is deterministic (same hash seeds, same interval)") {
    val a = Bootstrap.meanCi(Tables.events(spark, SfDir),
      "event_id", "value").head()
    val b = Bootstrap.meanCi(Tables.events(spark, SfDir),
      "event_id", "value").head()
    assert(a === b)
  }

  test("interval narrows with sample size (sqrt-n behavior, loosely)") {
    val ev = Tables.events(spark, SfDir)
    val small = Bootstrap.meanCi(ev.filter(col("event_id") % 10 === 0),
      "event_id", "value").head()
    val big = Bootstrap.meanCi(ev, "event_id", "value").head()
    def width(r: org.apache.spark.sql.Row) =
      r.getAs[Double]("ci_hi") - r.getAs[Double]("ci_lo")
    assert(width(big) < width(small),
      s"full-corpus CI ${width(big)} should be narrower than " +
        s"tenth-sample CI ${width(small)}")
  }
}
