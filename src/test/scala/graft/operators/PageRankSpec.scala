package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private def sym(pairs: (Long, Long)*) =
    (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")

  test("symmetric triangle: ranks stay uniform at 1/3") {
    val r = PageRank.run(sym((1L, 2L), (2L, 3L), (1L, 3L)), 5, 0.85)
      .collect().map(x => (x.getLong(0), x.getDouble(1))).toMap
    assert(r.keySet == Set(1L, 2L, 3L))
    r.values.foreach(v => assert(math.abs(v - 1.0 / 3.0) < 1e-9, s"$r"))
  }

  test("star: the hub out-ranks every leaf and mass is conserved") {
    val r = PageRank.run(sym((10L, 1L), (10L, 2L), (10L, 3L), (10L, 4L)),
      5, 0.85).collect().map(x => (x.getLong(0), x.getDouble(1))).toMap
    val hub = r(10L)
    (1L to 4L).foreach(l => assert(hub > r(l), s"$r"))
    // damped PR on a graph with no dangling nodes preserves total mass
    assert(math.abs(r.values.sum - 1.0) < 1e-6, s"sum=${r.values.sum}")
  }

  test("one iteration matches the hand-computed damped update") {
    // path 1-2-3 symmetrized: deg(1)=deg(3)=1, deg(2)=2; from uniform
    // r=1/3: node1 gets r2/2, node2 gets r1+r3, node3 gets r2/2
    val r = PageRank.run(sym((1L, 2L), (2L, 3L)), 1, 0.85)
      .collect().map(x => (x.getLong(0), x.getDouble(1))).toMap
    def fx(x: Double) = BigDecimal(x)
      .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    val third = fx(1.0 / 3.0)
    val half = fx(third / 2.0)
    val exp1 = fx(0.15 / 3.0 + 0.85 * half)
    val exp2 = fx(0.15 / 3.0 + 0.85 * (third + third))
    assert(r(1L) == BigDecimal(exp1).setScale(9,
      BigDecimal.RoundingMode.HALF_UP).toDouble, s"$r")
    assert(r(2L) == BigDecimal(exp2).setScale(9,
      BigDecimal.RoundingMode.HALF_UP).toDouble, s"$r")
    assert(r(1L) == r(3L))
  }
}
