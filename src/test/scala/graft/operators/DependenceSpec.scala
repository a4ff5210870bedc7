package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DependenceSpec extends SparkSpec {
  import spark.implicits._

  test("mutualInformation: independent columns give MI ~ 0, nmi 0-1") {
    // b cycles independently of a with balanced marginals
    val ind = (0 until 900).map(i => (i % 3, (i / 3) % 5)).toDF("a", "b")
    val r = Dependence.mutualInformation(ind, "a", "b").head()
    assert(r.getLong(0) == 900)
    assert(math.abs(r.getDouble(1)) < 1e-9, s"mi=${r.getDouble(1)}")
    assert(r.getDouble(4) == 0.0 || math.abs(r.getDouble(4)) < 1e-6)
  }

  test("mutualInformation: identical columns give MI = H and nmi = 1") {
    val same = (0 until 600).map(i => (i % 3, i % 3)).toDF("a", "b")
    val r = Dependence.mutualInformation(same, "a", "b").head()
    // uniform over 3 values: H = ln 3
    assert(math.abs(r.getDouble(1) - math.log(3.0)) < 1e-5)
    assert(math.abs(r.getDouble(2) - math.log(3.0)) < 1e-5)
    assert(r.getDouble(4) == 1.0, s"nmi=${r.getDouble(4)}")
  }

  test("mutualInformation: constant column yields nmi 0 (guarded), " +
      "not a division blow-up") {
    val const = (0 until 100).map(i => (1, i % 4)).toDF("a", "b")
    val r = Dependence.mutualInformation(const, "a", "b").head()
    assert(r.getDouble(2) == 0.0 && r.getDouble(4) == 0.0)
  }

  test("markov transitions: deterministic cycle gives ppm-exact rows " +
      "and per-from probabilities sum to ~1e6") {
    // one user, strict a->b->c->a cycle
    val ev = (0 until 30).map(i =>
      (1L, i.toLong, i.toLong, Seq("a", "b", "c")(i % 3)))
      .toDF("u", "t", "id", "s")
    val m = Markov.transitions(ev, "u", "t", "id", "s")
      .orderBy("from_state").collect()
    assert(m.length == 3)
    assert(m.forall(_.getLong(3) == 1000000L))
    // a appears 10 times, 10 a->b transitions except the tail
    assert(m.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("a", "b"), ("b", "c"), ("c", "a")))
  }

  test("benford: exponential-ish data leads with 1s; digits from the " +
      "decimal string form handle exact powers of ten") {
    val pow = Seq(1.0, 10.0, 100.0, 1000.0, 10000.0, 2.0, 3.0)
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val d = DigitAudit.benford(pow, "v").orderBy("digit").collect()
    assert(d.map(r => (r.getInt(0), r.getLong(1))).toSeq ==
      Seq((1, 5L), (2, 1L), (3, 1L)))
    // expected ppm literal for digit 1 is floor(log10(2)*1e6)
    assert(d.head.getLong(3) == 301029L)
  }
}
