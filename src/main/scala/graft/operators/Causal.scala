package graft.operators

import graft.operators.Ckpt.CkptOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Observational causal effect estimation by post-stratification —
  * the discrete-covariate special case of inverse-propensity
  * weighting: with exact within-stratum propensities
  * ê(s) = n_t(s)/n(s), the IPW estimator reduces algebraically to the
  * stratum-weighted difference of means
  * ATE = Σ_s (n(s)/N) · (ȳ_t(s) − ȳ_c(s)), which is what this
  * computes. One partial-agg scan collects per-(stratum, arm) decimal
  * moments; the weighting runs on the stratum-cardinality frame.
  *
  * Cross-engine determinism: decimal Σy per cell; per-stratum doubles
  * are identical expressions over identical inputs; per-stratum
  * contributions round to 9 dp and sum in DECIMAL so the final
  * reduction over strata is order-free too.
  */
object Causal {

  private def d184(c: Column): Column = c.cast(DecimalType(18, 4))

  /** Per-stratum readout plus a terminal `__ate` row. Columns:
    * (stratum, n, n_treat, mean_treat, mean_control, diff); the
    * `__ate` row carries N, total treated, null means, and the
    * post-stratified ATE in `diff`. Strata with an empty arm
    * contribute null diff and are excluded from the ATE sum (their
    * effect is unidentified — reported, not imputed). */
  def stratifiedEffect(df: DataFrame, stratumCol: String, treat: Column,
      yCol: String): DataFrame = {
    val cells = df
      .select(col(stratumCol).cast("string").as("stratum"),
        treat.as("__t"), d184(col(yCol)).as("__y"))
      .groupBy("stratum", "__t")
      .agg(count(lit(1)).as("__n"), sum(col("__y")).as("__s"))

    def arm(a: Boolean, c: String) = max(when(col("__t") === a, col(c)))

    val wide = cells.groupBy("stratum")
      .agg(arm(true, "__n").as("nt"), arm(true, "__s").as("st"),
        arm(false, "__n").as("nc"), arm(false, "__s").as("sc"))
      .select(col("stratum"),
        (coalesce(col("nt"), lit(0L)) + coalesce(col("nc"), lit(0L))).as("n"),
        coalesce(col("nt"), lit(0L)).as("n_treat"),
        when(col("nt").isNotNull,
          col("st").cast("double") / col("nt").cast("double")).as("mt"),
        when(col("nc").isNotNull,
          col("sc").cast("double") / col("nc").cast("double")).as("mc"))
      .withColumn("diff", col("mt") - col("mc"))

    val tot = wide.agg(
      sum(col("n")).as("tn"), sum(col("n_treat")).as("tt"),
      sum(when(col("diff").isNotNull, col("n")).otherwise(0L)).as("idN"))
    val perStratum = wide.crossJoin(broadcast(tot))
      .select(col("stratum"), col("n"), col("n_treat"),
        round(col("mt"), 6).as("mean_treat"),
        round(col("mc"), 6).as("mean_control"),
        round(col("diff"), 6).as("diff"))
    val ate = wide.crossJoin(broadcast(tot))
      .filter(col("diff").isNotNull)
      .select(round((col("n").cast("double") / col("idN").cast("double"))
          * col("diff"), 9).cast(DecimalType(28, 9)).as("__c"),
        col("tn"), col("tt"))
      .groupBy("tn", "tt")
      .agg(sum(col("__c")).cast("double").as("__ate"))
      .select(lit("__ate").as("stratum"), col("tn").as("n"),
        col("tt").as("n_treat"),
        lit(null).cast("double").as("mean_treat"),
        lit(null).cast("double").as("mean_control"),
        round(col("__ate"), 6).as("diff"))
    perStratum.unionAll(ate)
  }

  /** Coarsened exact matching ATT (Iacus–King–Porro 2012): coarsen
    * the covariates into discrete cells, keep only cells with BOTH a
    * treated and a control unit (common support), and weight each
    * cell's treated-minus-control mean difference by its treated
    * count — the matching-estimator rung of the causal ladder
    * (exact strata → CEM → modeled propensity), with the pruning
    * (units outside common support are DROPPED, not extrapolated)
    * reported explicitly.
    *
    * Scale shape: ONE partial-agg corpus scan to the cell grid
    * (coarsening bounds the cell count by construction), then grid
    * algebra. Means are identical doubles from exact decimal sums;
    * per-cell weighted terms round to 9 dp and DECIMAL-sum, so the
    * ATT is associativity-free on both engines. `cell1`/`cell2` must
    * be integer-valued coarsening expressions. Returns one row
    * (n_treat, n_treat_matched, n_cells_matched, att_cem,
    * att_naive). */
  def cemAtt(df: DataFrame, treat: Column, yCol: String,
      cell1: Column, cell2: Column): DataFrame = {
    val cells = df
      .select(cell1.cast("long").as("c1"), cell2.cast("long").as("c2"),
        treat.as("__t"), d184(col(yCol)).as("__y"))
      .groupBy("c1", "c2")
      .agg(sum(when(col("__t"), 1L).otherwise(0L)).as("nt"),
        sum(when(col("__t"), col("__y"))).as("st"),
        sum(when(!col("__t"), 1L).otherwise(0L)).as("nc"),
        sum(when(!col("__t"), col("__y"))).as("sc"))
      .graftCheckpoint(false) // grid-sized; feeds matched + naive aggs
    val matched = cells.filter(col("nt") > 0L && col("nc") > 0L)
      .select(col("nt"),
        round((col("st").cast("double") / col("nt").cast("double")
          - col("sc").cast("double") / col("nc").cast("double"))
          * col("nt").cast("double"), 9)
          .cast(DecimalType(28, 9)).as("__w"))
      .agg(count(lit(1)).as("n_cells_matched"),
        sum(col("nt")).as("n_treat_matched"),
        sum(col("__w")).cast("double").as("__ws"))
    val naive = cells.agg(sum(col("nt")).as("n_treat"),
      (sum(col("st")).cast("double") / sum(col("nt")).cast("double")
        - sum(col("sc")).cast("double") / sum(col("nc")).cast("double"))
        .as("__naive"))
    naive.crossJoin(broadcast(matched))
      .select(col("n_treat"), col("n_treat_matched"),
        col("n_cells_matched"),
        round(col("__ws") / col("n_treat_matched").cast("double"), 6)
          .as("att_cem"),
        round(col("__naive"), 6).as("att_naive"))
  }

  /** Difference-in-differences on the classic 2×2 (treated × post)
    * design: DiD = (ȳ_T,post − ȳ_T,pre) − (ȳ_C,post − ȳ_C,pre) —
    * the panel-data causal readout when treatment lands at a known
    * date and a control group carries the common trend. Reported with
    * the four cell sizes, the unpooled standard error
    * √(Σ s²_cell/n_cell) (the 2×2 design's delta-method SE), and the
    * t statistic DiD/SE.
    *
    * Scale shape: ONE partial-agg corpus scan to the 4-cell grid
    * (n, Σy, Σy² per cell as exact decimals); everything after is
    * 1-row algebra. Cell means/variances are identical doubles on any
    * engine (exact decimal sums, same cast/divide order), so the
    * 6-dp-rounded outputs agree bit-for-bit. Returns one row
    * (n_t_post, n_t_pre, n_c_post, n_c_pre, did, se, t_stat). */
  def diffInDiffs(df: DataFrame, treat: Column, post: Column,
      yCol: String): DataFrame = {
    val cells = df
      .select(treat.as("__t"), post.as("__p"), d184(col(yCol)).as("__y"))
      .groupBy("__t", "__p")
      .agg(count(lit(1)).as("__n"), sum(col("__y")).as("__s"),
        sum(col("__y") * col("__y")).as("__q"))
    def cell(t: Boolean, p: Boolean, c: String) =
      max(when(col("__t") === t && col("__p") === p, col(c)))
    val wide = cells.groupBy()
      .agg(cell(true, true, "__n").as("ntp"), cell(true, true, "__s").as("stp"),
        cell(true, true, "__q").as("qtp"),
        cell(true, false, "__n").as("nt0"), cell(true, false, "__s").as("st0"),
        cell(true, false, "__q").as("qt0"),
        cell(false, true, "__n").as("ncp"), cell(false, true, "__s").as("scp"),
        cell(false, true, "__q").as("qcp"),
        cell(false, false, "__n").as("nc0"), cell(false, false, "__s").as("sc0"),
        cell(false, false, "__q").as("qc0"))
    def m(s: String, n: String) =
      col(s).cast("double") / col(n).cast("double")
    // unbiased cell variance from the moment pair
    def v(q: String, s: String, n: String) = {
      val nd = col(n).cast("double")
      (col(q).cast("double") - col(s).cast("double")
        * col(s).cast("double") / nd) / (nd - 1.0)
    }
    val did = (m("stp", "ntp") - m("st0", "nt0")) -
      (m("scp", "ncp") - m("sc0", "nc0"))
    val se = sqrt(v("qtp", "stp", "ntp") / col("ntp").cast("double")
      + v("qt0", "st0", "nt0") / col("nt0").cast("double")
      + v("qcp", "scp", "ncp") / col("ncp").cast("double")
      + v("qc0", "sc0", "nc0") / col("nc0").cast("double"))
    wide.select(col("ntp").as("n_t_post"), col("nt0").as("n_t_pre"),
      col("ncp").as("n_c_post"), col("nc0").as("n_c_pre"),
      round(did, 6).as("did"), round(se, 6).as("se"),
      round(did / se, 6).as("t_stat"))
  }

  /** IPW (inverse-propensity-weighted) ATE with a MODELED propensity
    * — the continuous-confounder step past [[stratifiedEffect]]'s
    * exact discrete strata: ê(x) = σ(ŵ·x) from
    * [[Regression.logisticIrls2]]'s engine-exact IRLS fit (the
    * 6-dp-ROUNDED weights are the frozen model both engines
    * reproduce), propensities clipped to [clip, 1−clip], and the
    * Horvitz–Thompson estimator (1/N)Σ[t·y/ê − (1−t)·y/(1−ê)].
    * Per-row terms are identical doubles (literal weights, shared
    * libm slack absorbed by 6-dp rounding — y/ê amplification keeps
    * exp noise ~10² below the grain) DECIMAL-summed. `df` needs
    * numeric treatCol (0/1), yCol, and x1/x2 features (keep them
    * binary-exact-scaled — the q262 discipline). Returns one row
    * (n, n_treat, w0, w1, w2, ate_naive, ate_ipw). */
  def ipwAte(df: DataFrame, treatCol: String, yCol: String,
      x1Col: String, x2Col: String, iters: Int = 3,
      clip: Double = 0.01): DataFrame = {
    require(clip > 0.0 && clip < 0.5)
    val base = df.select(col(treatCol).cast("double").as("t"),
      col(yCol).cast("double").as("y"),
      col(x1Col).cast("double").as("x1"),
      col(x2Col).cast("double").as("x2")).graftCheckpoint(true)
    val fit = Regression.logisticIrls2(
      base.select(col("t").as("y"), col("x1"), col("x2")),
      "y", "x1", "x2", iters).collect().head
    val (w0, w1, w2) =
      (fit.getDouble(1), fit.getDouble(2), fit.getDouble(3))
    val p = lit(1.0) / (lit(1.0) +
      exp(-(lit(w0) + lit(w1) * col("x1") + lit(w2) * col("x2"))))
    val pc = least(greatest(p, lit(clip)), lit(1.0) - lit(clip))
    val term = col("t") * col("y") / pc -
      (lit(1.0) - col("t")) * col("y") / (lit(1.0) - pc)
    base.agg(
        count(lit(1)).as("n"),
        sum(when(col("t") === 1.0, 1L).otherwise(0L)).as("n_treat"),
        sum(when(col("t") === 1.0, d184(col("y")))).as("__st"),
        sum(when(col("t") =!= 1.0, d184(col("y")))).as("__sc"),
        sum(round(term, 6).cast(DecimalType(28, 6))).as("__ipw"))
      .select(col("n"), col("n_treat"),
        lit(w0).as("w0"), lit(w1).as("w1"), lit(w2).as("w2"),
        round(col("__st").cast("double")
            / col("n_treat").cast("double")
          - col("__sc").cast("double")
            / (col("n") - col("n_treat")).cast("double"), 6)
          .as("ate_naive"),
        round(col("__ipw").cast("double") / col("n").cast("double"), 6)
          .as("ate_ipw"))
  }

  /** Cochran–Mantel–Haenszel test of a binary outcome vs a binary
    * treatment CONTROLLING for strata — the 2×2×K companion to
    * [[stratifiedEffect]]'s continuous ATE (is the association real,
    * or a Simpson's-paradox artifact of stratum mix?). Per stratum:
    * a = treated successes, E[a] = n1·m1/n, Var[a] =
    * n1·n0·m1·m0/(n²(n−1)); CMH = (Σa − ΣE)² / ΣV (no continuity
    * correction — the engine-exact convention). One partial-agg scan
    * to the 2×2×K cells; all counts integer; per-stratum E and V are
    * identical doubles 9-dp DECIMAL-summed (order-free at any K).
    * Degenerate strata (n ≤ 1 or an empty margin) contribute 0 to
    * every sum — stated, not smoothed. Returns one row
    * (k_strata, n, sum_a, sum_e, cmh). */
  def cmhTest(df: DataFrame, stratumCol: String, treat: Column,
      outcome: Column): DataFrame = {
    val d289 = DecimalType(28, 9)
    val cells = df
      .select(col(stratumCol).cast("string").as("stratum"),
        treat.cast("boolean").as("__t"),
        outcome.cast("boolean").as("__y"))
      .groupBy("stratum")
      .agg(count(lit(1)).as("n"),
        sum(when(col("__t"), 1L).otherwise(0L)).as("n1"),
        sum(when(col("__y"), 1L).otherwise(0L)).as("m1"),
        sum(when(col("__t") && col("__y"), 1L).otherwise(0L)).as("a"))
    val ok = col("n") > 1L && col("n1") > 0L && col("n1") < col("n") &&
      col("m1") > 0L && col("m1") < col("n")
    val nD = col("n").cast("double")
    val e = col("n1").cast("double") * col("m1").cast("double") / nD
    val v = col("n1").cast("double") *
      (col("n") - col("n1")).cast("double") *
      col("m1").cast("double") *
      (col("n") - col("m1")).cast("double") /
      (nD * nD * (nD - 1.0))
    cells
      .select(col("n"),
        when(ok, col("a")).otherwise(0L).as("__a"),
        when(ok, round(e, 9)).otherwise(0.0).cast(d289).as("__e"),
        when(ok, round(v, 9)).otherwise(0.0).cast(d289).as("__v"))
      .agg(count(lit(1)).as("k_strata"), sum(col("n")).as("n"),
        sum(col("__a")).as("sum_a"),
        sum(col("__e")).cast("double").as("se"),
        sum(col("__v")).cast("double").as("sv"))
      .select(col("k_strata"), col("n"), col("sum_a"),
        round(col("se"), 6).as("sum_e"),
        round((col("sum_a").cast("double") - col("se"))
          * (col("sum_a").cast("double") - col("se")) / col("sv"), 6)
          .as("cmh"))
  }
}
