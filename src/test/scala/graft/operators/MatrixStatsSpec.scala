package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MatrixStatsSpec extends SparkSpec {
  import spark.implicits._

  test("known correlations: perfect positive, perfect negative, zero") {
    val df = Seq(
      (1.0, 2.0, -1.0, 5.0),
      (2.0, 4.0, -2.0, 5.0),
      (3.0, 6.0, -3.0, 5.0),
      (4.0, 8.0, -4.0, 5.0)).toDF("a", "b", "c", "d")
    val out = MatrixStats.correlationMatrix(df, Seq("a", "b", "c"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(out(("a", "a")) == 1.0)
    assert(out(("a", "b")) == 1.0, "b = 2a must correlate 1")
    assert(out(("a", "c")) == -1.0, "c = -a must correlate -1")
  }

  test("agrees with Spark's builtin corr on the fixture money columns") {
    val li = graft.Tables.lineitem(spark, SfDir)
    val out = MatrixStats.correlationMatrix(li,
      Seq("l_discount", "l_extendedprice", "l_quantity", "l_tax"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    for (a <- Seq("l_discount", "l_quantity");
         b <- Seq("l_extendedprice", "l_tax")) {
      val key = if (a <= b) (a, b) else (b, a) // matrix stores a ≤ b
      val ref = li.agg(corr(col(a), col(b))).head().getDouble(0)
      assert(math.abs(out(key) - ref) < 1e-5,
        s"corr($a,$b): ${out(key)} vs builtin $ref")
    }
  }

  test("one scan regardless of pair count: a single aggregate node") {
    val li = graft.Tables.lineitem(spark, SfDir)
    val plan = MatrixStats.correlationMatrix(li,
      Seq("l_discount", "l_extendedprice", "l_quantity", "l_tax"))
      .queryExecution.executedPlan.toString
    // one HashAggregate pair (partial+final) over one scan, no join
    assert(!plan.contains("Join"), s"moments must come from ONE scan:\n$plan")
    assert(plan.split("FileScan").length == 2,
      s"exactly one file scan expected:\n$plan")
  }

  test("partialCorrelation: controlling the confounder strips a " +
      "relayed correlation; perfect collinearity reports null") {
    import spark.implicits._
    // x = 2z + e, y = 3z − e' with independent small e: raw r(x,y) is
    // strongly positive purely through z; the partial must shrink
    // toward the (negative) e-correlation
    val rows = (0 until 64).map { i =>
      val z = (i % 8).toDouble
      val e = ((i / 8) % 4 - 1.5) / 2.0
      val e2 = ((i * 3) % 4 - 1.5) / 2.0
      (2.0 * z + e, 3.0 * z + e2, z)
    }
    val df = rows.toDF("x", "y", "z")
    val r = MatrixStats.partialCorrelation(df, "x", "y", "z")
      .collect().head
    assert(r.getLong(0) == 64L)
    assert(r.getDouble(1) > 0.9, s"raw correlation relays z: $r")
    assert(math.abs(r.getDouble(2)) < 0.35,
      s"partial must strip the confounder: $r")
    // local replay of the same moment algebra
    def mean(s: Seq[Double]) = s.sum / s.length
    val (xs, ys, zs) = (rows.map(_._1), rows.map(_._2), rows.map(_._3))
    def cov(a: Seq[Double], b: Seq[Double]) =
      mean(a.zip(b).map { case (p, q) => p * q }) - mean(a) * mean(b)
    def cor(a: Seq[Double], b: Seq[Double]) =
      cov(a, b) / math.sqrt(cov(a, a) * cov(b, b))
    val expect = (cor(xs, ys) - cor(xs, zs) * cor(ys, zs)) /
      math.sqrt((1 - math.pow(cor(xs, zs), 2))
        * (1 - math.pow(cor(ys, zs), 2)))
    assert(math.abs(r.getDouble(2) - expect) < 1e-5, s"$r vs $expect")
    // y perfectly collinear with z → den = 0 → null partial
    val coll = rows.map { case (x, _, z) => (x, 5.0 * z, z) }
      .toDF("x", "y", "z")
    assert(MatrixStats.partialCorrelation(coll, "x", "y", "z")
      .collect().head.isNullAt(2))
    // constant z → zero variance → null, not an ANSI division error
    val flat = rows.map { case (x, y, _) => (x, y, 4.0) }
      .toDF("x", "y", "z")
    val fr = MatrixStats.partialCorrelation(flat, "x", "y", "z")
      .collect().head
    assert(fr.isNullAt(2) && !fr.isNullAt(1), s"$fr")
  }
}
