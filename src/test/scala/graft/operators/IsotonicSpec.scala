package graft.operators

import graft.SparkSpec

class IsotonicSpec extends SparkSpec {
  import spark.implicits._

  test("pavPpm pools adjacent violators: rates .1 .3 .2 .4 fit to " +
      ".1 .25 .25 .4") {
    val binned = Seq((0L, 10L, 1L), (1L, 10L, 3L), (2L, 10L, 2L),
      (3L, 10L, 4L)).toDF("bin", "n", "pos")
    val out = Isotonic.pavPpm(binned).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq((0L, 100000L, 100000L),
      (1L, 300000L, 250000L), (2L, 200000L, 250000L),
      (3L, 400000L, 400000L)))
  }

  test("pavPpm leaves an already-monotone table unchanged and is " +
      "weight-aware when pooling") {
    val mono = Seq((0L, 5L, 1L), (1L, 5L, 2L), (2L, 5L, 4L))
      .toDF("bin", "n", "pos")
    val outM = Isotonic.pavPpm(mono).collect()
      .map(r => (r.getLong(3), r.getLong(4)))
    assert(outM.forall { case (raw, iso) => raw == iso })
    // weighted pool: rates .5 (n=10) then .1 (n=30) -> both (5+3)/40 = .2
    val w = Seq((0L, 10L, 5L), (1L, 30L, 3L)).toDF("bin", "n", "pos")
    val outW = Isotonic.pavPpm(w).collect().map(_.getLong(4))
    assert(outW.toSeq == Seq(200000L, 200000L))
  }

  test("pavPpm conserves weighted mass: sum n_i * iso_rate equals " +
      "total positives up to ppm truncation dust") {
    val noisy = (0L until 15L).map(b =>
      (b, 40L, (b * 29 % 17) + 2)).toDF("bin", "n", "pos")
    val rows = Isotonic.pavPpm(noisy).collect()
    val mass = rows.map(r => r.getLong(1) * r.getLong(4)).sum
    val posTotal = rows.map(_.getLong(2)).sum * 1000000L
    // each pooled block truncates once: dust < n_total per block
    assert(math.abs(mass - posTotal) < 15L * 40L * 15L,
      s"$mass vs $posTotal")
  }

  test("pavPpm output is always nondecreasing on a noisy table and " +
      "partitioning-independent") {
    val noisy = (0L until 20L).map(b =>
      (b, 50L, (b * 37 % 23) + 1)).toDF("bin", "n", "pos")
    val a = Isotonic.pavPpm(noisy).collect().map(_.getLong(4)).toSeq
    assert(a == a.sorted, s"not monotone: $a")
    val b = Isotonic.pavPpm(noisy.repartition(7)).collect()
      .map(_.getLong(4)).toSeq
    assert(a == b)
  }
}
