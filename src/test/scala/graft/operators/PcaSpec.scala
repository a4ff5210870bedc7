package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PcaSpec extends SparkSpec {
  import spark.implicits._

  private val Dim = graft.SparkEntry.EmbedDim

  test("jacobiEigen solves a known 3x3 symmetric system") {
    // A = diag(5, 2, 1) rotated is overkill; use a matrix with known
    // spectrum: [[2,1,0],[1,2,0],[0,0,3]] → eigenvalues 3, 3, 1
    val a = Array(
      Array(2.0, 1.0, 0.0),
      Array(1.0, 2.0, 0.0),
      Array(0.0, 0.0, 3.0))
    val (evals, evecs) = Pca.jacobiEigen(a)
    assert(evals.map(v => math.rint(v * 1e9) / 1e9).toSeq
      == Seq(3.0, 3.0, 1.0))
    // every (λ, v) satisfies A·v = λ·v
    for (k <- 0 until 3) {
      val v = evecs(k)
      val av = a.map(row => row.indices.map(j => row(j) * v(j)).sum)
      for (i <- 0 until 3)
        assert(math.abs(av(i) - evals(k) * v(i)) < 1e-9,
          s"A·v ≠ λ·v at eigenpair $k row $i")
    }
    // eigenvectors are orthonormal
    for (p <- 0 until 3; q <- 0 until 3) {
      val d = (0 until 3).map(i => evecs(p)(i) * evecs(q)(i)).sum
      assert(math.abs(d - (if (p == q) 1.0 else 0.0)) < 1e-9)
    }
  }

  test("covarianceMatrix agrees with a direct two-pass computation") {
    val embs = graft.Tables.embeddings(spark, SfDir)
    val cov = Pca.covarianceMatrix(embs, "embedding", Dim)
      .filter(col("i") < 4 && col("j") < 4)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    // direct check on a handful of cells via DataFrame covar_pop over
    // the same round-6 inputs
    for (i <- 0 until 4; j <- i until 4) {
      val direct = embs.select(
          round(element_at(col("embedding"), i + 1).cast("double"), 6)
            .as("a"),
          round(element_at(col("embedding"), j + 1).cast("double"), 6)
            .as("b"))
        .agg(covar_pop(col("a"), col("b"))).head().getDouble(0)
      assert(math.abs(cov((i, j)) - direct) < 2e-6,
        s"cov($i,$j): ${cov((i, j))} vs $direct")
    }
  }

  test("fit + project: components are orthonormal, variance ordered, " +
      "and reconstruction improves with k") {
    val embs = graft.Tables.embeddings(spark, SfDir)
    val (evals, comps, mean) = Pca.fit(embs, "embedding", Dim, 8)
    assert(evals.length == 8 && comps.length == 8 && mean.length == Dim)
    // eigenvalues descending and non-negative (covariance is PSD)
    assert(evals.sliding(2).forall(w => w(0) >= w(1) - 1e-12))
    assert(evals.forall(_ >= -1e-9))
    // components orthonormal
    for (p <- comps.indices; q <- comps.indices) {
      val d = (0 until Dim).map(i => comps(p)(i) * comps(q)(i)).sum
      assert(math.abs(d - (if (p == q) 1.0 else 0.0)) < 1e-9)
    }
    // projection adds pc1..pc8 and explains the expected variance:
    // Var(pc_k) ≈ λ_k on the corpus itself
    val proj = Pca.project(embs, "embedding", comps, mean)
    assert((1 to 8).forall(i => proj.columns.contains(s"pc$i")))
    val v1 = proj.agg(var_pop(col("pc1"))).head().getDouble(0)
    assert(math.abs(v1 - evals(0)) < 1e-3,
      s"Var(pc1)=$v1 should approximate λ1=${evals(0)}")
    // captured variance (Σ top-k λ) grows monotonically toward total
    val total = Pca.momentsLocal(embs, "embedding", Dim)
      ._3.zipWithIndex.map { case (row, i) => row(i) }.sum
    val top8 = evals.sum
    assert(top8 <= total + 1e-9 && top8 > 0.0)
  }

  test("covarianceMatrix is bit-identical across repartitionings " +
      "(exact integer moments)") {
    val embs = graft.Tables.embeddings(spark, SfDir)
    def run(df: org.apache.spark.sql.DataFrame): Seq[(Int, Int, Double)] =
      Pca.covarianceMatrix(df, "embedding", Dim)
        .orderBy("i", "j").collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2))).toSeq
    val a = run(embs.repartition(1))
    val b = run(embs.repartition(17))
    val c = run(embs.repartition(32, col("vec_id")))
    assert(a == b, "1-partition vs 17-partition covariance differs")
    assert(a == c, "1-partition vs keyed-32 covariance differs")
    // exactness sanity: every value is a 6-dp decimal exactly
    assert(a.forall { case (_, _, v) => math.rint(v * 1e6) / 1e6 == v })
  }

  test("covarianceMatrix never emits a signed zero, and rounds ties " +
      "half-away (the q201 driver-hash divergence, round 8)") {
    // Tiny negative covariance that rounds to zero at 6 dp: a round()
    // over the double quotient yields −0.0 in sign-preserving engines
    // (DuckDB) but +0.0 via BigDecimal (Spark) — one bit, one failed
    // round. The integer half-away path must produce the integer 0 →
    // POSITIVE zero, always.
    val negTiny = Seq(
      ("a", Seq(0.0, 1e-6)), ("b", Seq(1e-6, 0.0))
    ).toDF("vec_id", "embedding")
    val r = Pca.covarianceMatrix(negTiny, "embedding", 2)
      .orderBy("i", "j").collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    // exact numerator for (0,1): n·Σxy − Σx·Σy = 2·0 − 1·1 = −1 < 0
    val z = r((0, 1))
    assert(z == 0.0, s"cov(0,1) should round to zero, got $z")
    assert(java.lang.Double.doubleToRawLongBits(z) == 0L,
      "cov(0,1) is the NEGATIVE zero — sign bit must not survive")
    // ties round half away from zero, both signs: quotient ±0.5 µ
    val tiePos = Seq(("a", Seq(0.0, 0.0)), ("b", Seq(0.001, 0.002)))
      .toDF("vec_id", "embedding")
    val tp = Pca.covarianceMatrix(tiePos, "embedding", 2)
      .filter(col("i") === 0 && col("j") === 1).head().getDouble(2)
    assert(tp == 1e-6, s"+0.5µ tie should round to 1µ, got $tp")
    val tieNeg = Seq(("a", Seq(0.0, 0.0)), ("b", Seq(0.001, -0.002)))
      .toDF("vec_id", "embedding")
    val tn = Pca.covarianceMatrix(tieNeg, "embedding", 2)
      .filter(col("i") === 0 && col("j") === 1).head().getDouble(2)
    assert(tn == -1e-6, s"-0.5µ tie should round to -1µ, got $tn")
  }

  test("varianceExplained shares sum to the top-k fraction") {
    val evals = Array(4.0, 2.0, 1.0, 1.0)
    val df = Pca.varianceExplained(spark, evals)
    assert(math.abs(
      df.agg(sum(col("share"))).head().getDouble(0) - 1.0) < 1e-12)
    assert(df.orderBy("component").select("eigenvalue").as[Double]
      .collect().toSeq == Seq(4.0, 2.0, 1.0, 1.0))
  }

  test("procrustesAlign recovers a pure dimension permutation: R is " +
      "orthogonal and A·R reproduces B") {
    // a_i: deterministic full-rank-ish 6-dim vectors (exact at 6 dp);
    // b_i = a_i with dimensions REVERSED, i.e. B = A·P for the
    // reversal permutation P — the Procrustes optimum is exactly P.
    val d = 6
    val as = (0 until 9).map(i =>
      Array.tabulate(d)(k => (((i * 7 + k * 3) % 11) - 5) / 4.0f))
    val pairs = as.map(a => (a.toSeq, a.reverse.toSeq))
      .toDF("a", "b")
    val r = Pca.procrustesAlign(pairs, "a", "b", d)
    for (i <- 0 until d; j <- 0 until d) {
      val expect = if (j == d - 1 - i) 1.0 else 0.0
      assert(math.abs(r(i)(j) - expect) < 1e-4,
        s"R($i,$j) = ${r(i)(j)}, want $expect")
    }
    // orthogonality: RᵀR = I
    for (i <- 0 until d; j <- 0 until d) {
      val dotv = (0 until d).map(k => r(k)(i) * r(k)(j)).sum
      assert(math.abs(dotv - (if (i == j) 1.0 else 0.0)) < 1e-6)
    }
    // alignment: ‖a·R − b‖ ≈ 0 for every pair
    for (a <- as) {
      val b = a.reverse
      for (j <- 0 until d) {
        val got = (0 until d).map(k => a(k) * r(k)(j)).sum
        assert(math.abs(got - b(j)) < 1e-4, s"dim $j: $got vs ${b(j)}")
      }
    }
  }
}
