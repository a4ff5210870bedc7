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

  test("chi2: perfectly independent balanced table gives chi2 = 0; " +
      "identical columns give Cramér's V = 1") {
    val ind = (0 until 900).map(i => (i % 3, (i / 3) % 5)).toDF("a", "b")
    val r0 = Dependence.chi2(ind, "a", "b").head()
    assert(r0.getLong(0) == 900 && r0.getLong(1) == 8L)
    assert(r0.getDouble(2) == 0.0, s"chi2=${r0.getDouble(2)}")
    val same = (0 until 300).map(i => (i % 4, i % 4)).toDF("a", "b")
    val r1 = Dependence.chi2(same, "a", "b").head()
    assert(r1.getDouble(3) == 1.0, s"V=${r1.getDouble(3)}")
  }

  test("chi2 matches the textbook 2x2 hand computation, including " +
      "empty-cell E charges") {
    // table: (x,p)=20 (x,q)=10 (y,p)=10 (y,q)=20; n=60
    val rows = Seq.fill(20)(("x", "p")) ++ Seq.fill(10)(("x", "q")) ++
      Seq.fill(10)(("y", "p")) ++ Seq.fill(20)(("y", "q"))
    val r = Dependence.chi2(rows.toDF("a", "b"), "a", "b").head()
    // E = 15 everywhere; chi2 = 4 * 25/15 = 20/3
    val exp = BigDecimal(4 * (25.0 / 15.0)).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(r.getDouble(2) - exp) < 2e-6, s"$r vs $exp")
    assert(r.getLong(1) == 1L)
    // empty-cell charge: drop (y,q) entirely → grid must still charge E
    val sparse = Seq.fill(6)(("x", "p")) ++ Seq.fill(6)(("x", "q")) ++
      Seq.fill(6)(("y", "p"))
    val r2 = Dependence.chi2(sparse.toDF("a", "b"), "a", "b").head()
    // marginals: x=12, y=6, p=12, q=6, n=18; E(y,q)=2, O=0 → term 2
    // E(x,p)=8 O=6 → .5; E(x,q)=4 O=6 → 1; E(y,p)=4 O=6 → 1
    assert(math.abs(r2.getDouble(2) - 4.5) < 1e-6, s"$r2")
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

  test("entropyProfile: single-category users score 0, uniform " +
      "two-category users ln 2; mean and quartiles follow") {
    // 2 monotone users (entropy 0), 2 uniform binary users (ln 2)
    val rows = Seq(
      (1L, "a"), (1L, "a"), (2L, "b"), (2L, "b"),
      (3L, "a"), (3L, "b"), (4L, "a"), (4L, "b"))
    val r = Dependence.entropyProfile(rows.toDF("u", "c"), "u", "c")
      .head()
    val ln2 = BigDecimal(math.log(2.0)).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getLong(0) == 4L)
    assert(math.abs(r.getDouble(1) - ln2 / 2) < 1e-6, s"$r")
    assert(r.getDouble(2) == 0.0) // p25: lower half is the 0s
    assert(r.getDouble(3) == 0.0) // lower median (ceil(2) = 2nd of 4)
    assert(r.getDouble(4) == ln2) // p75
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

  test("kendallTau: perfect monotone association is tau = 1; " +
      "a reversed axis flips it to -1") {
    val up = Seq((1.0, 1.0), (2.0, 2.0), (3.0, 3.0)).toDF("x", "y")
    val r = Dependence.kendallTau(up, "x", "y").collect().head
    assert(r.getLong(1) == 3L && r.getLong(2) == 0L)
    assert(r.getDouble(3) == 1.0, s"$r")
    val down = Seq((1.0, 3.0), (2.0, 2.0), (3.0, 1.0)).toDF("x", "y")
    assert(Dependence.kendallTau(down, "x", "y").collect().head
      .getDouble(3) == -1.0)
  }

  test("kendallTau: hand-computed tie case — the 2x2 balanced grid " +
      "has one concordant, one discordant pair and tau_b = 0") {
    // rows (1,1),(1,2),(2,1),(2,2): x<x' pairs: (1,1)-(2,2) conc,
    // (1,2)-(2,1) disc, two y-ties; n0=6, n1=n2=2 -> tau=0/4
    val df = Seq((1.0, 1.0), (1.0, 2.0), (2.0, 1.0), (2.0, 2.0))
      .toDF("x", "y")
    val r = Dependence.kendallTau(df, "x", "y").collect().head
    assert(r.getLong(0) == 4L && r.getLong(1) == 1L && r.getLong(2) == 1L)
    assert(r.getDouble(3) == 0.0, s"$r")
  }

  test("kendallTau is duplicate-weighted and partitioning-independent") {
    val base = (1 to 300).map(i => ((i % 7).toDouble, (i % 5).toDouble))
    val df = base.toDF("x", "y")
    val a = Dependence.kendallTau(df, "x", "y").collect().head.toSeq
    val b = Dependence.kendallTau(df.repartition(11), "x", "y")
      .collect().head.toSeq
    assert(a == b)
  }

  test("cochranArmitage: hand-computed trend z; proportional rates " +
      "give exactly +0.0; reversed trend negates; one dose level null") {
    def cells(rs: Seq[Int]): org.apache.spark.sql.DataFrame =
      rs.zipWithIndex.flatMap { case (r, i) =>
        Seq.fill(r)((i + 1L, true)) ++ Seq.fill(10 - r)((i + 1L, false))
      }.toDF("dose", "s")
    // doses 1,2,3 with n=10 each, r=(1,5,9): N=30, R=15, Σtn=60,
    // Σtr=38, Σt²n=140 → z = 240·√30 / √(15·15·600)
    val up = Dependence.cochranArmitage(cells(Seq(1, 5, 9)), "dose",
      col("s")).collect().head
    val expZ = BigDecimal(240.0 * math.sqrt(30.0) / math.sqrt(135000.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert((up.getLong(0), up.getLong(1), up.getLong(2)) ==
      ((3L, 30L, 15L)))
    assert(up.getDouble(3) == expZ, s"$up vs $expZ")
    val down = Dependence.cochranArmitage(cells(Seq(9, 5, 1)), "dose",
      col("s")).collect().head
    assert(down.getDouble(3) == -expZ, s"$down")
    // equal per-dose rates: numerator exactly 0 → POSITIVE zero
    val flat = Dependence.cochranArmitage(cells(Seq(2, 2, 2)), "dose",
      col("s")).collect().head
    assert(flat.getDouble(3) == 0.0 && java.lang.Double
      .doubleToRawLongBits(flat.getDouble(3)) == 0L, s"$flat")
    // a single dose level cannot carry a trend
    val one = Dependence.cochranArmitage(
      Seq((1L, true), (1L, false)).toDF("dose", "s"), "dose",
      col("s")).collect().head
    assert(one.isNullAt(3), s"$one")
  }
}
