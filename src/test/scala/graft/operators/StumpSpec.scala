package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class StumpSpec extends SparkSpec {
  import spark.implicits._

  test("bestSplit finds the perfect separator and its gain equals " +
      "the parent entropy") {
    // x < 10 all negative, x >= 10 all positive → split at x = 5
    val rows = Seq(1.0 -> false, 3.0 -> false, 5.0 -> false,
      10.0 -> true, 12.0 -> true, 14.0 -> true)
    val r = Stump.bestSplit(rows.toDF("x", "y"), "x", col("y"))
      .collect().head
    assert(r.getDouble(0) == 5.0, s"$r")
    assert(r.getLong(1) == 3L && r.getLong(2) == 0L)
    assert(r.getLong(3) == 3L && r.getLong(4) == 3L)
    val ln2 = BigDecimal(math.log(2.0)).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(r.getDouble(5) - ln2) < 1e-6, s"gain ${r.getDouble(5)}")
  }

  test("bestSplit: pure-label input has zero gain everywhere and " +
      "reports the smallest candidate (deterministic tie-break)") {
    val rows = Seq(1.0, 2.0, 3.0, 4.0).map(_ -> true)
    val r = Stump.bestSplit(rows.toDF("x", "y"), "x", col("y"))
      .collect().head
    assert(r.getDouble(5) == 0.0)
    assert(r.getDouble(0) == 1.0, s"tie must break low: $r")
  }

  test("bestSplit matches an exhaustive local search on mixed data") {
    val rows = (1 to 60).map(i => (i.toDouble, i % 3 == 0 || i > 40))
    val r = Stump.bestSplit(rows.toDF("x", "y"), "x", col("y"))
      .collect().head
    // local exhaustive replay
    def xlx(k: Long) = if (k > 0) k.toDouble * math.log(k.toDouble) else 0.0
    val n = rows.size.toLong
    val p = rows.count(_._2).toLong
    val best = rows.map(_._1).distinct.sorted.dropRight(1).map { v =>
      val left = rows.filter(_._1 <= v)
      val (nl, pl) = (left.size.toLong, left.count(_._2).toLong)
      val (nr, pr) = (n - nl, p - pl)
      val ig = ((xlx(n) - xlx(p) - xlx(n - p))
        - (xlx(nl) - xlx(pl) - xlx(nl - pl))
        - (xlx(nr) - xlx(pr) - xlx(nr - pr))) / n
      (v, ig)
    }.maxBy(t => (t._2, -t._1))
    assert(r.getDouble(0) == best._1, s"$r vs $best")
    assert(math.abs(r.getDouble(5) - best._2) < 1e-6)
  }

  test("boostedSseStumps: a perfectly splittable target is solved in " +
      "one round — round 2 sees zero residual SSE") {
    val df = (Seq.fill(4)((0.0, 10.0)) ++ Seq.fill(4)((1.0, 20.0)))
      .toDF("x", "y")
    val rows = Stump.boostedSseStumps(df, "x", "y", rounds = 2).collect()
    val r1 = rows(0); val r2 = rows(1)
    assert(r1.getDouble(1) == 0.0, s"split at 0: $r1")
    assert(r1.getDouble(2) == 10.0 && r1.getDouble(3) == 20.0)
    assert(r1.getDouble(4) == 2000.0) // sum y^2 = 4*100 + 4*400
    assert(r2.getDouble(4) == 0.0, s"round 2 must see 0 SSE: $r2")
    assert(r2.getDouble(2) == 0.0 && r2.getDouble(3) == 0.0)
  }

  test("boostedSseStumps: residual SSE strictly decreases across " +
      "rounds on a 4-level target; partitioning-independent") {
    val df = (0 until 200).map(i => ((i % 4).toDouble, 5.0 * (i % 4)))
      .toDF("x", "y")
    val rows = Stump.boostedSseStumps(df, "x", "y", rounds = 3).collect()
    val sses = rows.map(_.getDouble(4)).toSeq
    assert(sses == sses.sorted.reverse && sses(0) > sses(1)
      && sses(1) > sses(2), s"$sses")
    val again = Stump.boostedSseStumps(df.repartition(9), "x", "y", 3)
      .collect().map(_.toSeq).toSeq
    assert(again == rows.map(_.toSeq).toSeq)
  }
}
