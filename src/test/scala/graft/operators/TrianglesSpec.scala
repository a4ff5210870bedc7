package graft.operators

import graft.SparkSpec

class TrianglesSpec extends SparkSpec {

  test("counts a known graph exactly (one triangle + one open wedge)") {
    import spark.implicits._
    // 1-2, 1-3, 2-3 form a triangle; 3-4 hangs off it
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val r = Triangles.count(edges).head()
    assert(r.getAs[Long]("n_triangles") === 1L)
    // wedges with ordered endpoints: (1,2,3) closed, (1,3,4) and (2,3,4) open
    assert(r.getAs[Long]("n_wedges") === 3L)
    assert(r.getAs[Double]("closure_rate") === 0.333333) // rounded to 6 dp
  }

  test("a clique of 4 has C(4,3)=4 triangles, every wedge closed") {
    import spark.implicits._
    val edges = (for {
      a <- 1 to 4; b <- (a + 1) to 4
    } yield (a.toLong, b.toLong)).toDF("a", "b")
    val r = Triangles.count(edges).head()
    assert(r.getAs[Long]("n_triangles") === 4L)
    assert(r.getAs[Double]("closure_rate") === 1.0)
  }

  test("a triangle-free graph (star) counts zero") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)).toDF("a", "b")
    val r = Triangles.count(edges).head()
    assert(r.getAs[Long]("n_triangles") === 0L)
  }

  test("duplicate edge rows do not multiply wedge or triangle counts") {
    import spark.implicits._
    val base = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))
    val dup = (base ++ base ++ base.take(2)).toDF("a", "b")
    val r = Triangles.count(dup).head()
    assert(r.getAs[Long]("n_triangles") === 1L)
    assert(r.getAs[Long]("n_wedges") === 3L)
  }

  test("localClustering: clique vertices score 1, star center 0, " +
      "pendant (deg 1) reports the 0 convention") {
    import spark.implicits._
    // triangle {1,2,3} with pendant 4 on vertex 3; star center 10
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L),
      (10L, 20L), (10L, 21L), (10L, 22L)).toDF("a", "b")
    val m = Triangles.localClustering(edges).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    assert(m(1L) == ((2L, 1L, 1.0)) && m(2L) == ((2L, 1L, 1.0)))
    assert(m(3L) == ((3L, 1L, BigDecimal(1.0 / 3.0).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(m(4L) == ((1L, 0L, 0.0)))
    assert(m(10L) == ((3L, 0L, 0.0)))
  }
}
