package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PointInTimeSpec extends SparkSpec {
  import PointInTime.strictPriorStats

  test("same-instant carriers are excluded — the leakage guard") {
    import spark.implicits._
    val labels = Seq((1L, 100L, 10L)).toDF("k", "s", "label_id")
    val carriers = Seq((1L, 99L, 1.0), (1L, 100L, 100.0),
      (1L, 101L, 1000.0)).toDF("k", "s", "v")
    val r = strictPriorStats(labels, carriers, "k", "s", "s",
      Some("v"), "f").head()
    assert(r.getAs[Long]("f_n") === 1L)       // only the t=99 carrier
    assert(r.getAs[Double]("f_sum") === 1.0)  // not the same-second 100.0
    assert(r.getAs[Long]("f_last_s") === 99L)
  }

  test("keys are isolated; a probe with no prior carriers gets zero/null") {
    import spark.implicits._
    val labels = Seq((1L, 100L, 10L), (2L, 100L, 20L))
      .toDF("k", "s", "label_id")
    val carriers = Seq((1L, 50L, 5.0)).toDF("k", "s", "v")
    val rows = strictPriorStats(labels, carriers, "k", "s", "s",
      Some("v"), "f")
      .collect().map(r => r.getAs[Long]("label_id") ->
        (r.getAs[Long]("f_n"), r.isNullAt(r.fieldIndex("f_last_s"))))
      .toMap
    assert(rows(10L) === ((1L, false)))
    assert(rows(20L) === ((0L, true)))
  }

  test("running stats accumulate in event-time order per probe") {
    import spark.implicits._
    val labels = Seq((1L, 10L, 1L), (1L, 20L, 2L), (1L, 30L, 3L))
      .toDF("k", "s", "label_id")
    val carriers = Seq((1L, 5L, 1.0), (1L, 15L, 2.0), (1L, 25L, 4.0))
      .toDF("k", "s", "v")
    val got = strictPriorStats(labels, carriers, "k", "s", "s",
      Some("v"), "f")
      .collect().map(r => (r.getAs[Long]("label_id"),
        r.getAs[Long]("f_n"), r.getAs[Double]("f_sum"))).sortBy(_._1).toSeq
    assert(got === Seq((1L, 1L, 1.0), (2L, 2L, 3.0), (3L, 3L, 7.0)))
  }
}
