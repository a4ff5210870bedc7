package graft.operators

import graft.operators.Ckpt.CkptOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Closed-form distributed OLS — the "fit a linear model over 100 TB
  * without a gradient loop" operator. The corpus pass is ONE
  * partial-aggregating scan producing the k(k+3)/2 + 2 normal-equation
  * moments (n, Σxᵢ, Σxᵢxⱼ, Σy, Σxᵢy, Σy²); the solve is a single
  * deterministic expression over that 1-row metadata frame (Cramer's
  * rule for the 3×3 system), so nothing model-sized ever iterates and
  * nothing corpus-sized is ever collected.
  *
  * Exactness discipline (the [[AbTest]] pattern): inputs are 2-dp
  * quantities, so moments accumulate in DECIMAL — Spark's partial-agg
  * order and a single-threaded engine's order produce the SAME sums.
  * The fragile float math (determinants, divisions) happens once, on
  * identical double inputs, as an identical expression tree — so an
  * oracle writing the same formula text gets bit-identical results.
  */
object Regression {

  private def d184(c: Column): Column = c.cast(DecimalType(18, 4))

  /** OLS of `y ~ 1 + x1 + x2`: one row with n, coefficients (b0, b1,
    * b2) and r2, floats rounded to 6 dp. Requires the design matrix to
    * be non-degenerate (det ≠ 0); fixture data with collinear
    * regressors would surface as a null coefficient row. */
  def ols2(df: DataFrame, yCol: String, x1Col: String, x2Col: String)
      : DataFrame = {
    val (y, x1, x2) = (d184(col(yCol)), d184(col(x1Col)), d184(col(x2Col)))
    val m = df.agg(
      count(lit(1)).cast("double").as("n"),
      sum(x1).cast("double").as("s1"),
      sum(x2).cast("double").as("s2"),
      sum(x1 * x1).cast("double").as("s11"),
      sum(x1 * x2).cast("double").as("s12"),
      sum(x2 * x2).cast("double").as("s22"),
      sum(y).cast("double").as("sy"),
      sum(x1 * y).cast("double").as("s1y"),
      sum(x2 * y).cast("double").as("s2y"),
      sum(y * y).cast("double").as("syy"))
    // Cramer's rule on [[n,s1,s2],[s1,s11,s12],[s2,s12,s22]] b = rhs.
    // The formula TEXT below is mirrored verbatim in the oracle SQL —
    // identical operation order on identical doubles is bit-identical.
    val det = col("n") * (col("s11") * col("s22") - col("s12") * col("s12")) -
      col("s1") * (col("s1") * col("s22") - col("s12") * col("s2")) +
      col("s2") * (col("s1") * col("s12") - col("s11") * col("s2"))
    val det0 = col("sy") * (col("s11") * col("s22") - col("s12") * col("s12")) -
      col("s1") * (col("s1y") * col("s22") - col("s12") * col("s2y")) +
      col("s2") * (col("s1y") * col("s12") - col("s11") * col("s2y"))
    val det1 = col("n") * (col("s1y") * col("s22") - col("s12") * col("s2y")) -
      col("sy") * (col("s1") * col("s22") - col("s12") * col("s2")) +
      col("s2") * (col("s1") * col("s2y") - col("s1y") * col("s2"))
    val det2 = col("n") * (col("s11") * col("s2y") - col("s1y") * col("s12")) -
      col("s1") * (col("s1") * col("s2y") - col("s1y") * col("s2")) +
      col("sy") * (col("s1") * col("s12") - col("s11") * col("s2"))
    val b0 = det0 / det
    val b1 = det1 / det
    val b2 = det2 / det
    // SSE = Σy² − b·(X'y); SST = Σy² − (Σy)²/n — both from moments only
    val sse = col("syy") - b0 * col("sy") - b1 * col("s1y") - b2 * col("s2y")
    val sst = col("syy") - col("sy") * col("sy") / col("n")
    m.select(
      col("n").cast("long").as("n"),
      round(b0, 6).as("b0"),
      round(b1, 6).as("b1"),
      round(b2, 6).as("b2"),
      round(lit(1.0) - sse / sst, 6).as("r2"))
  }

  /** Ridge (L2-penalized) regression of `y ~ 1 + x1 + x2` — [[ols2]]
    * with λ added to the slope diagonal of the normal equations (the
    * intercept is unpenalized, the standard convention), the stabilizer
    * for collinear features where plain OLS explodes. SAME single
    * moment scan and Cramer solve; `lambda` must be an exact decimal
    * literal so both engines add the identical double. Returns one row
    * (n, lambda, b0, b1, b2) — r2 is omitted deliberately: penalized
    * residuals don't decompose into the OLS SSE identity. */
  def ridge2(df: DataFrame, yCol: String, x1Col: String, x2Col: String,
      lambda: Double): DataFrame = {
    require(lambda >= 0.0)
    val (y, x1, x2) = (d184(col(yCol)), d184(col(x1Col)), d184(col(x2Col)))
    val m = df.agg(
      count(lit(1)).cast("double").as("n"),
      sum(x1).cast("double").as("s1"),
      sum(x2).cast("double").as("s2"),
      (sum(x1 * x1).cast("double") + lambda).as("s11"),
      sum(x1 * x2).cast("double").as("s12"),
      (sum(x2 * x2).cast("double") + lambda).as("s22"),
      sum(y).cast("double").as("sy"),
      sum(x1 * y).cast("double").as("s1y"),
      sum(x2 * y).cast("double").as("s2y"))
    val det = col("n") * (col("s11") * col("s22") - col("s12") * col("s12")) -
      col("s1") * (col("s1") * col("s22") - col("s12") * col("s2")) +
      col("s2") * (col("s1") * col("s12") - col("s11") * col("s2"))
    val det0 = col("sy") * (col("s11") * col("s22") - col("s12") * col("s12")) -
      col("s1") * (col("s1y") * col("s22") - col("s12") * col("s2y")) +
      col("s2") * (col("s1y") * col("s12") - col("s11") * col("s2y"))
    val det1 = col("n") * (col("s1y") * col("s22") - col("s12") * col("s2y")) -
      col("sy") * (col("s1") * col("s22") - col("s12") * col("s2")) +
      col("s2") * (col("s1") * col("s2y") - col("s1y") * col("s2"))
    val det2 = col("n") * (col("s11") * col("s2y") - col("s1y") * col("s12")) -
      col("s1") * (col("s1") * col("s2y") - col("s1y") * col("s2")) +
      col("sy") * (col("s1") * col("s12") - col("s11") * col("s2"))
    m.select(
      col("n").cast("long").as("n"),
      lit(lambda).as("lambda"),
      round(det0 / det, 6).as("b0"),
      round(det1 / det, 6).as("b1"),
      round(det2 / det, 6).as("b2"))
  }

  /** Log-log price elasticity of demand: OLS slope of
    * ln(quantity) ~ ln(price) across entities — the classic "what
    * does a 1 % price move do to volume" readout (slope < −1 =
    * elastic). Entities reduce to one (price, qty) row by exact
    * decimal aggregation; ln terms are identical doubles of exact
    * inputs, rounded to 7 dp and DECIMAL-summed (the IRLS
    * discipline — irrational lns can't ride exact decimal sums
    * directly). The unit price is Σrevenue/Σqty computed in DOUBLE
    * from exact decimal sums (no decimal division — engines disagree
    * on its rounding); entities with non-positive sums are excluded
    * (ln pole). Returns one row
    * (n_entities, elasticity, intercept, r2). */
  def priceElasticity(df: DataFrame, entityCol: String,
      revenueCol: String, qtyCol: String): DataFrame = {
    val d289 = DecimalType(28, 9)
    val per = df.groupBy(col(entityCol).as("__e"))
      .agg(sum(col(revenueCol).cast(DecimalType(18, 4))).as("__r"),
        sum(col(qtyCol).cast(DecimalType(18, 4))).as("__q"))
      .filter(col("__r") > 0 && col("__q") > 0)
    val x = log(col("__r").cast("double") / col("__q").cast("double"))
    val y = log(col("__q").cast("double"))
    def t7(c: Column) = sum(round(c, 7).cast(d289)).cast("double")
    val m = per.agg(count(lit(1)).cast("double").as("n"),
      t7(x).as("sx"), t7(x * x).as("sxx"), t7(y).as("sy"),
      t7(x * y).as("sxy"), t7(y * y).as("syy"))
    val beta = (col("sxy") - col("sx") * col("sy") / col("n")) /
      (col("sxx") - col("sx") * col("sx") / col("n"))
    val alpha = col("sy") / col("n") - beta * (col("sx") / col("n"))
    val sse = col("syy") - alpha * col("sy") - beta * col("sxy")
    val sst = col("syy") - col("sy") * col("sy") / col("n")
    m.select(col("n").cast("long").as("n_entities"),
      round(beta, 6).as("elasticity"),
      round(alpha, 6).as("intercept"),
      round(lit(1.0) - sse / sst, 6).as("r2"))
  }

  /** Closed-form K-FOLD CROSS-VALIDATED ridge selection — model
    * selection over a λ grid from ONE moments-per-fold scan: because
    * normal-equation moments are ADDITIVE, each fold's training
    * moments are total − fold (exact decimal subtraction), so every
    * (fold, λ) fit is a Cramer solve on a metadata frame and the
    * validation SSE is a quadratic form in the SAME fold moments —
    * no second pass over data, no gradient loop, nothing collected.
    * Folds come from the md5-bucket hash (the [[Resample]] mirror);
    * per-fold SSE terms are bit-identical doubles rounded to INTEGER
    * (at ~1e14 magnitudes the sub-integer digits sit below double
    * ulp) and DECIMAL-summed across folds. Returns
    * (lambda, cv_rmse) ordered by lambda — the arg-min row is the
    * selected model. */
  def cvRidge(df: DataFrame, yCol: String, x1Col: String, x2Col: String,
      foldKey: Column, lambdas: Seq[Double], k: Int = 5): DataFrame = {
    require(k >= 2 && lambdas.nonEmpty)
    val (y, x1, x2) = (d184(col(yCol)), d184(col(x1Col)), d184(col(x2Col)))
    // the md5 fold hash + 10 decimal products are the op's only
    // corpus-sized CPU; a single-row-group local fixture scans as ONE
    // task, so spread the (4-column) input first when the scan has
    // fewer partitions than cores — on a real multi-split table this
    // is a no-op (same guard as Tables.spread)
    val raw0 = df.select(foldKey.cast("string").as("__fk"),
      y.as("y"), x1.as("x1"), x2.as("x2"))
    val p = df.sparkSession.sparkContext.defaultParallelism
    val raw = if (raw0.rdd.getNumPartitions < p) raw0.repartition(p)
      else raw0
    val perFold = raw
      .select((conv(substring(md5(col("__fk")), 1, 15),
        16, 10).cast("long") % k).as("fold"),
        col("y"), col("x1"), col("x2"))
      .groupBy("fold")
      .agg(count(lit(1)).as("n"), sum(col("x1")).as("s1"),
        sum(col("x2")).as("s2"), sum(col("x1") * col("x1")).as("s11"),
        sum(col("x1") * col("x2")).as("s12"),
        sum(col("x2") * col("x2")).as("s22"),
        sum(col("y")).as("sy"), sum(col("x1") * col("y")).as("s1y"),
        sum(col("x2") * col("y")).as("s2y"),
        sum(col("y") * col("y")).as("syy"))
      .graftCheckpoint(true) // k-row metadata frame
    val names = Seq("n", "s1", "s2", "s11", "s12", "s22", "sy",
      "s1y", "s2y", "syy")
    val tot = broadcast(perFold.agg(
      names.map(c => sum(col(c)).as(s"t_$c")).head,
      names.map(c => sum(col(c)).as(s"t_$c")).tail: _*))
    val withL = perFold.crossJoin(tot)
      .withColumn("lambda",
        explode(array(lambdas.map(lit(_)): _*)))
    // training moments = total − fold, all exact-decimal → double
    def t(c: String) = (col(s"t_$c") - col(c)).cast("double")
    val (n, s1, s2, sy, s1y, s2y) =
      (t("n"), t("s1"), t("s2"), t("sy"), t("s1y"), t("s2y"))
    val s11 = t("s11") + col("lambda")
    val s12 = t("s12")
    val s22 = t("s22") + col("lambda")
    val det = n * (s11 * s22 - s12 * s12) -
      s1 * (s1 * s22 - s12 * s2) + s2 * (s1 * s12 - s11 * s2)
    val det0 = sy * (s11 * s22 - s12 * s12) -
      s1 * (s1y * s22 - s12 * s2y) + s2 * (s1y * s12 - s11 * s2y)
    val det1 = n * (s1y * s22 - s12 * s2y) -
      sy * (s1 * s22 - s12 * s2) + s2 * (s1 * s2y - s1y * s2)
    val det2 = n * (s11 * s2y - s1y * s12) -
      s1 * (s1 * s2y - s1y * s2) + sy * (s1 * s12 - s11 * s2)
    val b0 = det0 / det
    val b1 = det1 / det
    val b2 = det2 / det
    // validation SSE on the held-out fold's own moments (quadratic form)
    def f(c: String) = col(c).cast("double")
    val sse = f("syy") + b0 * b0 * f("n") + b1 * b1 * f("s11") +
      b2 * b2 * f("s22") - lit(2.0) * b0 * f("sy") -
      lit(2.0) * b1 * f("s1y") - lit(2.0) * b2 * f("s2y") +
      lit(2.0) * b0 * b1 * f("s1") + lit(2.0) * b0 * b2 * f("s2") +
      lit(2.0) * b1 * b2 * f("s12")
    withL
      .select(col("lambda"), col("n"),
        round(sse, 0).cast(DecimalType(38, 0)).as("__sse"))
      .groupBy("lambda")
      .agg(sum(col("n")).as("__nv"),
        sum(col("__sse")).cast("double").as("__s"))
      .select(col("lambda"),
        round(sqrt(col("__s") / col("__nv").cast("double")), 6)
          .as("cv_rmse"))
      .orderBy("lambda")
  }

  /** 3×3 Cramer solve — EXACTLY [[ols2]]'s operation order, shared by
    * the Scala (driver) and SQL (oracle) sides of the IRLS loop so
    * both run bit-identical float ops. a is the symmetric system
    * matrix packed (a00,a01,a02,a11,a12,a22), b the rhs. */
  private[operators] def solve3(a00: Double, a01: Double, a02: Double,
      a11: Double, a12: Double, a22: Double,
      b0: Double, b1: Double, b2: Double): (Double, Double, Double) = {
    val det = a00 * (a11 * a22 - a12 * a12) -
      a01 * (a01 * a22 - a12 * a02) +
      a02 * (a01 * a12 - a11 * a02)
    val det0 = b0 * (a11 * a22 - a12 * a12) -
      a01 * (b1 * a22 - a12 * b2) +
      a02 * (b1 * a12 - a11 * b2)
    val det1 = a00 * (b1 * a22 - a12 * b2) -
      b0 * (a01 * a22 - a12 * a02) +
      a02 * (a01 * b2 - b1 * a02)
    val det2 = a00 * (a11 * b2 - b1 * a12) -
      a01 * (a01 * b2 - b1 * a02) +
      b0 * (a01 * a12 - a11 * a02)
    (det0 / det, det1 / det, det2 / det)
  }

  /** Engine-exact distributed LOGISTIC regression via IRLS (Fisher
    * scoring): y ~ σ(w0 + w1·x1 + w2·x2), `iters` Newton steps. Each
    * step is ONE partial-agg scan collecting the 9 weighted normal-
    * equation moments against LITERAL current weights (the
    * [[KMeans]] bounded-iteration discipline — only 3 doubles of
    * model state ever reach the driver), then a 3×3 Cramer solve
    * whose operation order is mirrored verbatim in the oracle.
    *
    * Determinism: per-row μ/s/z terms are identical double
    * expressions of literal weights and exact 2-dp-derived features,
    * rounded to 7 dp and DECIMAL-summed (7 dp leaves ~50 double-ulps
    * of slack around each rounding boundary, absorbing any last-ulp
    * libm exp() difference between engines); the b-side terms use the
    * algebraic form x_j·(s·η + (y−μ)) — bounded even where s → 0, so
    * no z = η + (y−μ)/s blow-up enters a rounded term. Returns one
    * row (n, w0, w1, w2, accuracy) — accuracy from exact integer
    * counts of sign(η) agreement under the final weights. */
  def logisticIrls2(df: DataFrame, yCol: String, x1Col: String,
      x2Col: String, iters: Int = 3): DataFrame = {
    require(iters >= 1)
    val d289 = DecimalType(28, 9)
    val base = df.select(col(yCol).cast("double").as("y"),
      col(x1Col).cast("double").as("x1"),
      col(x2Col).cast("double").as("x2"))

    var w = (0.0, 0.0, 0.0)
    for (_ <- 1 to iters) {
      val eta = lit(w._1) + lit(w._2) * col("x1") + lit(w._3) * col("x2")
      val mu = lit(1.0) / (lit(1.0) + exp(-eta))
      val s = mu * (lit(1.0) - mu)
      val bTerm = s * eta + (col("y") - mu)
      def t7(c: Column) = sum(round(c, 7).cast(d289))
      val r = base.agg(
        t7(s).as("a00"), t7(s * col("x1")).as("a01"),
        t7(s * col("x2")).as("a02"),
        t7(s * col("x1") * col("x1")).as("a11"),
        t7(s * col("x1") * col("x2")).as("a12"),
        t7(s * col("x2") * col("x2")).as("a22"),
        t7(bTerm).as("b0"), t7(col("x1") * bTerm).as("b1"),
        t7(col("x2") * bTerm).as("b2")).collect().head
      def d(i: Int) = {
        val x = r.getDecimal(i)
        require(x != null, "IRLS moment sum is null — the weights " +
          "diverged to NaN (singular/degenerate design matrix, e.g. " +
          "a constant feature). Drop or de-collinearize the features.")
        x.doubleValue()
      }
      w = solve3(d(0), d(1), d(2), d(3), d(4), d(5), d(6), d(7), d(8))
    }

    val etaF = lit(w._1) + lit(w._2) * col("x1") + lit(w._3) * col("x2")
    base.agg(count(lit(1)).as("n"),
        sum(when((etaF >= 0.0) === (col("y") >= 0.5), 1L).otherwise(0L))
          .as("ok"))
      .select(col("n").cast("long").as("n"),
        round(lit(w._1), 6).as("w0"), round(lit(w._2), 6).as("w1"),
        round(lit(w._3), 6).as("w2"),
        round(col("ok").cast("double") / col("n").cast("double"), 6)
          .as("accuracy"))
  }
}
