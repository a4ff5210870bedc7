package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftext.CovMomentsAgg

/** Distributed PCA over an embedding column, in the shape a 100 TB
  * corpus demands: the ONLY corpus-scale work is a single
  * partial-aggregated scan accumulating second moments
  * ([[CovMomentsAgg]] — one ~17 KB buffer per partition crosses the
  * wire); the d×d covariance matrix is INDEX METADATA (d = 64 here ⇒
  * 2 080 doubles, same status as IVF centroids), eigendecomposed on
  * the driver with cyclic Jacobi rotations; projection broadcasts the
  * k×d component matrix back as literals — a map-only stage.
  *
  * Uses: embedding whitening / decorrelation before quantization
  * (OPQ-style), dimensionality reduction for cheaper ANN (the learned
  * cousin of the Matryoshka prefix), and embedding-health checks
  * (effective rank, anisotropy — a collapsed embedding space shows up
  * as one dominant eigenvalue).
  */
object Pca {

  /** Covariance matrix as rows (i, j, cov), i ≤ j, population form,
    * rounded to 6. One scan; inputs pre-rounded to 6 with Spark's
    * `round` (i.e. exact integers at scale 1e6), moments accumulated
    * in EXACT integer arithmetic ([[CovMomentsAgg]]), and the
    * covariance assembled by exact integer algebra — cov(i,j) =
    * (n·Σkᵢkⱼ − Σkᵢ·Σkⱼ) / n² / 1e12, rounded to 6 dp by INTEGER
    * half-away-from-zero rounding of the exact numerator (micro =
    * ±⌊(2·|num| + den) / (2·den)⌋ with den = n²·1e6, all DECIMAL(38,0))
    * and ONE double division (micro / 1e6) at the very end. Integer
    * algebra everywhere means a zero cell is the integer 0 → +0.0 in
    * every IEEE engine — a `round(double)` path instead lets a tiny
    * negative covariance round to the SIGNED zero −0.0 in engines whose
    * `round` preserves the sign bit (DuckDB) but not in Spark (whose
    * `round` goes through BigDecimal, which has no signed zero); that
    * one-bit divergence cost a round of hash mismatches. The result is
    * a pure function of the input multiset: bit-identical across
    * partitionings and engines. */
  def covarianceMatrix(embs: DataFrame, vecCol: String, dim: Int)
      : DataFrame = {
    val rounded = transform(col(vecCol), x => round(x.cast("double"), 6))
    val moments = embs
      .agg(CovMomentsAgg.covMoments(rounded, dim).as("m"))
    // index maps for the flattened upper triangle: k-th entry = (i, j)
    val iIdx = (for { i <- 0 until dim; j <- i until dim } yield i).toArray
    val jIdx = (for { i <- 0 until dim; j <- i until dim } yield j).toArray
    val ski = element_at(col("sx"),
      element_at(typedLit(iIdx), col("k") + 1) + 1)
    val skj = element_at(col("sx"),
      element_at(typedLit(jIdx), col("k") + 1) + 1)
    moments.select(
        element_at(col("m"), 1).as("n"),
        slice(col("m"), 2, dim).as("sx"),
        slice(col("m"), 2 + dim, dim * (dim + 1) / 2).as("sxy"))
      .select(col("n"), col("sx"),
        posexplode(col("sxy")).as(Seq("k", "sxy")))
      .select(
        element_at(typedLit(iIdx), col("k") + 1).as("i"),
        element_at(typedLit(jIdx), col("k") + 1).as("j"),
        (col("n") * col("sxy") - ski * skj).as("num"),
        (col("n") * col("n") * lit(1000000L).cast("decimal(38,0)"))
          .as("den"))
      .filter(col("den") > 0) // empty corpus: n = 0 → den = n²·10⁶ = 0;
      // return the empty frame, not an ANSI division error
      .select(col("i"), col("j"),
        // exact integer half-away rounding (den > 0, DIV truncates
        // toward zero = floor on the non-negative operands used here),
        // mirrored token-for-token by the HUGEINT oracle
        (expr("""CASE WHEN num < 0
                 THEN -((2 * (-num) + den) DIV (2 * den))
                 ELSE  ((2 *   num  + den) DIV (2 * den)) END""")
          .cast("double") / 1e6).as("cov"))
  }

  /** Driver-side moments fetch: (n, mean, full d×d covariance).
    * Moments arrive as exact DECIMAL(38,0) scaled integers; covariance
    * entries use the same exact-numerator-then-one-division rule as
    * [[covarianceMatrix]]. */
  def momentsLocal(embs: DataFrame, vecCol: String, dim: Int)
      : (Long, Array[Double], Array[Array[Double]]) = {
    val rounded = transform(col(vecCol), x => round(x.cast("double"), 6))
    val m = embs.agg(CovMomentsAgg.covMoments(rounded, dim).as("m"))
      .head().getSeq[java.math.BigDecimal](0)
      .map(d => d.toBigIntegerExact: BigInt).toArray
    val n = m(0).longValue
    require(n > 0, "covariance of an empty corpus")
    val nD = n.toDouble
    val sk = (0 until dim).map(i => m(1 + i)).toArray
    val mean = sk.map(s => s.toDouble / 1e6 / nD)
    val cov = Array.ofDim[Double](dim, dim)
    var k = 1 + dim
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val num = m(0) * m(k) - sk(i) * sk(j)
        val c = num.toDouble / nD / nD / 1e12
        cov(i)(j) = c; cov(j)(i) = c
        k += 1; j += 1
      }
      i += 1
    }
    (n, mean, cov)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix. Returns
    * (eigenvalues desc, eigenvectors as rows, matching order). O(d³)
    * per sweep on a metadata-sized matrix — driver work, like k-means
    * on IVF centroids. Deterministic: fixed sweep order, fixed
    * tolerance. */
  def jacobiEigen(a0: Array[Array[Double]], maxSweeps: Int = 64,
      tol: Double = 1e-12): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    while (sweep < maxSweeps && off > tol) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) /
              (math.abs(theta) + math.sqrt(theta * theta + 1.0)) match {
                case 0.0 => 1.0 // theta == 0 ⇒ 45° rotation
                case x => x
              }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    val order = (0 until d).sortBy(i => -a(i)(i))
    val evals = order.map(i => a(i)(i)).toArray
    val evecs = order.map(i => (0 until d).map(k => v(k)(i)).toArray).toArray
    (evals, evecs)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = i + 1
      while (j < a.length) { s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    s
  }

  /** Orthogonal Procrustes alignment between two embedding spaces
    * (Schönemann 1966): the rotation R minimizing ‖A·R − B‖ over the
    * PAIRED snapshots — the index-migration operator ("the embedder
    * was retrained; rotate the old vectors instead of re-embedding
    * 100 TB"). R = U·Vᵀ from the SVD of M = AᵀB; here the SVD rides
    * the existing symmetric machinery: MᵀM = V·Σ²·Vᵀ via
    * [[jacobiEigen]], u_j = M·v_j/σ_j. M comes from ONE distributed
    * scan ([[EmbeddingAudit.crossSecondMoment]], the same grid the
    * oracle checks) collected as a d²-cell metadata frame; the O(d³)
    * solve is driver math like [[fit]]. Near-zero singular values
    * (rank-deficient pairing) contribute nothing — the returned R is
    * then the minimizer over the spanned subspace. */
  def procrustesAlign(pairs: DataFrame, aCol: String, bCol: String,
      dim: Int): Array[Array[Double]] = {
    val cells = graft.operators.EmbeddingAudit
      .crossSecondMoment(pairs, aCol, bCol, dim)
      .select("i", "j", "xmom").collect()
    require(cells.nonEmpty, "procrustes of an empty pair relation")
    val m = Array.ofDim[Double](dim, dim)
    cells.foreach(r => m(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
    val mtm = Array.tabulate(dim, dim)((i, j) =>
      (0 until dim).map(k => m(k)(i) * m(k)(j)).sum)
    val (ev, vrows) = jacobiEigen(mtm)
    val r = Array.ofDim[Double](dim, dim)
    val sMax = math.sqrt(math.max(ev.headOption.getOrElse(0.0), 0.0))
    for (jj <- 0 until dim) {
      val sigma = math.sqrt(math.max(ev(jj), 0.0))
      if (sigma > 1e-9 * math.max(sMax, 1.0)) {
        val vj = vrows(jj)
        val uj = Array.tabulate(dim)(i =>
          (0 until dim).map(k => m(i)(k) * vj(k)).sum / sigma)
        var i = 0
        while (i < dim) {
          var l = 0
          while (l < dim) { r(i)(l) += uj(i) * vj(l); l += 1 }
          i += 1
        }
      }
    }
    r
  }

  /** Fit top-k principal components: (eigenvalues desc, components as
    * k rows of d, corpus mean). */
  def fit(embs: DataFrame, vecCol: String, dim: Int, k: Int)
      : (Array[Double], Array[Array[Double]], Array[Double]) = {
    require(k >= 1 && k <= dim, s"k out of range: $k")
    val (_, mean, cov) = momentsLocal(embs, vecCol, dim)
    val (evals, evecs) = jacobiEigen(cov)
    (evals.take(k), evecs.take(k), mean)
  }

  /** Project each vector onto the fitted components — map-only, the
    * k×d component matrix rides as broadcast literals. Adds
    * `pc1..pck` columns. */
  def project(embs: DataFrame, vecCol: String,
      components: Array[Array[Double]], mean: Array[Double]): DataFrame =
    components.zipWithIndex.foldLeft(embs) { case (df, (comp, ci)) =>
      val score = comp.indices.map { j =>
        (element_at(col(vecCol), j + 1).cast("double") - lit(mean(j))) *
          lit(comp(j))
      }.reduce(_ + _)
      df.withColumn(s"pc${ci + 1}", round(score, 6))
    }

  /** Variance-explained profile of the spectrum — the embedding-health
    * scalar view (effective rank / anisotropy). Driver-computed from
    * metadata; returned as a DataFrame for pipeline composition. */
  def varianceExplained(spark: org.apache.spark.sql.SparkSession,
      evals: Array[Double]): DataFrame = {
    import spark.implicits._
    val total = evals.sum
    evals.toIndexedSeq.zipWithIndex.map { case (ev, i) =>
      (i + 1, ev, if (total == 0) 0.0 else ev / total)
    }.toDF("component", "eigenvalue", "share")
  }
}
