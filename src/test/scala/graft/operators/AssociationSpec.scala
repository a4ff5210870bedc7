package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AssociationSpec extends SparkSpec {
  import spark.implicits._

  private val baskets = Seq(
    (1L, 1L), (1L, 2L), (1L, 3L),
    (2L, 1L), (2L, 2L),
    (3L, 1L), (3L, 2L), (3L, 2L), // duplicate item counts once
    (4L, 3L), (4L, 4L),
    (5L, 4L)
  ).toDF("user_id", "item")

  test("itemPairLift: hand-checked support/confidence/lift") {
    val got = Association.itemPairLift(baskets, "user_id", "item",
      minPairs = 2L).collect()
    assert(got.length === 1) // only (1,2) co-occurs twice+
    val r = got.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((1L, 2L, 3L)))
    assert(r.getDouble(3) === 0.6)      // support: 3 of 5 baskets
    assert(r.getDouble(4) === 1.0)      // conf(1→2): every 1-basket has 2
    assert(r.getDouble(5) === 1.0)
    assert(r.getDouble(6) === 1.666667) // lift: 3*5/(3*3)
  }

  test("itemPairLift: minPairs=1 keeps singleton pairs, lift can dip below 1") {
    val got = Association.itemPairLift(baskets, "user_id", "item",
      minPairs = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(6)).toMap
    assert(got.keySet === Set((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)))
    assert(got((3L, 4L)) === 1.25) // 1*5/(2*2)
    assert(got((1L, 3L)) < 1.0)    // 1*5/(3*2) = 0.833333
  }

  test("frequentItemsets: hand-checked A-priori lattice on the fixture") {
    // baskets (deduped): {1,2,3}, {1,2}, {1,2}, {3,4}, {4}
    val got = Association.frequentItemsets(baskets, "user_id", "item",
      minSupport = 2L).collect()
      .map(r => (r.getInt(0), r.getSeq[String](1).toList, r.getLong(2)))
    val byK = got.groupBy(_._1)
    assert(byK(1).map(t => t._2.head -> t._3).toMap ==
      Map("1" -> 3L, "2" -> 3L, "3" -> 2L, "4" -> 2L))
    assert(byK(2).map(t => t._2 -> t._3).toMap ==
      Map(List("1", "2") -> 3L))
    assert(!byK.contains(3), "no triple reaches support 2")
    // anti-monotonicity holds: every frequent pair's members are
    // frequent singletons
    val f1 = byK(1).map(_._2.head).toSet
    assert(byK(2).forall(_._2.forall(f1)))
    // output is totally ordered by (k, items-joined)
    assert(got.map(t => (t._1, t._2.mkString("|"))).toSeq ==
      got.map(t => (t._1, t._2.mkString("|"))).sorted.toSeq)
  }

  test("frequentItemsets finds a triple when one exists, and pruning " +
      "by frequent-1 does not lose it") {
    val df = Seq(
      (1L, 10L), (1L, 20L), (1L, 30L),
      (2L, 10L), (2L, 20L), (2L, 30L),
      (3L, 10L), (3L, 20L), (3L, 30L), (3L, 99L) // 99 infrequent
    ).toDF("b", "i")
    val got = Association.frequentItemsets(df, "b", "i", minSupport = 3L)
      .collect()
      .map(r => (r.getInt(0), r.getSeq[String](1).toList, r.getLong(2)))
    assert(got.contains((3, List("10", "20", "30"), 3L)))
    assert(!got.exists(_._2.contains("99")))
  }

  test("itemPairLift: over-cap baskets are dropped, not truncated-arbitrarily") {
    val wide = (1L to 30L).map(i => (1L, i)) ++ Seq((2L, 1L), (2L, 2L),
      (3L, 1L), (3L, 2L))
    val got = Association.itemPairLift(wide.toDF("user_id", "item"),
      "user_id", "item", minPairs = 2L, cap = 10).collect()
    // basket 1 exceeds the cap and is dropped; (1,2) still pairs via 2+3
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 2L)))
    assert(got.head.getLong(2) === 2L)
  }
}
