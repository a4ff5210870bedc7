package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** A/B experiment analysis: Welch's unequal-variance t-test per metric
  * group, computed from EXACT decimal moments (n, Σx, Σx²) so the
  * heavy pass is one partial-aggregating groupBy over the event stream —
  * the only cross-engine-fragile float math happens on the final
  * metadata-scale (group × arm) frame, as a single deterministic
  * expression per row.
  *
  * The fixture's `value` doubles are exact 2-dp quantities, so Σx and
  * Σx² accumulate exactly in DECIMAL (no FP association drift between
  * Spark's partial-agg order and DuckDB's single-threaded order); means
  * and variances are then derived in double from identical exact inputs.
  */
object AbTest {

  private def d184(c: Column): Column = c.cast(DecimalType(18, 4))

  /** Welch's t-statistic and Satterthwaite degrees of freedom for each
    * `groupCol`, arms defined by boolean `armA` (true → arm A).
    * Returns (groupCol, n_a, n_b, mean_a, mean_b, t_stat, df_w), all
    * floats rounded to 6 dp. Sample variance (n−1 denominator). */
  def welch(df: DataFrame, groupCol: String, valueCol: String,
      armA: Column): DataFrame = {
    val moments = df
      .select(col(groupCol), armA.as("__a"), col(valueCol).as("__v"))
      .groupBy(groupCol, "__a")
      .agg(count(lit(1)).cast("double").as("__n"),
        sum(d184(col("__v"))).cast("double").as("__s"),
        sum(d184(col("__v")) * d184(col("__v"))).cast("double").as("__q"))

    def arm(a: Boolean, c: String) = max(when(col("__a") === a, col(c)))

    val wide = moments.groupBy(groupCol)
      .agg(arm(true, "__n").as("na"), arm(true, "__s").as("sa"),
        arm(true, "__q").as("qa"),
        arm(false, "__n").as("nb"), arm(false, "__s").as("sb"),
        arm(false, "__q").as("qb"))

    val va = (col("qa") - col("sa") * col("sa") / col("na")) / (col("na") - 1.0)
    val vb = (col("qb") - col("sb") * col("sb") / col("nb")) / (col("nb") - 1.0)
    val se2a = va / col("na")
    val se2b = vb / col("nb")
    wide.select(col(groupCol),
      col("na").cast("long").as("n_a"), col("nb").cast("long").as("n_b"),
      round(col("sa") / col("na"), 6).as("mean_a"),
      round(col("sb") / col("nb"), 6).as("mean_b"),
      round((col("sa") / col("na") - col("sb") / col("nb")) /
        sqrt(se2a + se2b), 6).as("t_stat"),
      round((se2a + se2b) * (se2a + se2b) /
        (se2a * se2a / (col("na") - 1.0) +
         se2b * se2b / (col("nb") - 1.0)), 6).as("df_w"))
  }

  /** One-way ANOVA F-test across ALL levels of `groupCol` — the k-arm
    * generalization of [[welch]] (equal-variance pooled form): does the
    * metric mean differ across any group? The corpus pass is ONE
    * partial-agg groupBy collecting exact decimal moments per group
    * (n_g, Σx, Σx²); the between/within decomposition runs on the
    * k-row metadata frame. Cross-group float sums (Σ_g S_g²/n_g) are
    * made association-free by rounding each group's bit-identical
    * double term to 6 dp and DECIMAL-summing — for terms ≥ 2^52 the
    * round is the identity (doubles there are integers), so the
    * technique holds at any magnitude. Returns one row
    * (k, n, f_stat, df1, df2). */
  def anovaF(df: DataFrame, groupCol: String, valueCol: String)
      : DataFrame = {
    val d386 = DecimalType(38, 6)
    val m = df
      .select(col(groupCol).as("__g"), d184(col(valueCol)).as("__v"))
      .groupBy("__g")
      .agg(count(lit(1)).as("__n"),
        sum(col("__v")).cast("double").as("__s"),
        sum(col("__v") * col("__v")).cast("double").as("__q"))
    // per-group term S_g²/n_g: IEEE ops on exact inputs → bit-identical
    // doubles in both engines; 6-dp decimal sum kills order sensitivity
    val terms = m.select(col("__n"), col("__q"),
      round(col("__s"), 6).cast(d386).as("__sd"),
      round(col("__s") * col("__s") / col("__n").cast("double"), 6)
        .cast(d386).as("__t"),
      round(col("__q"), 6).cast(d386).as("__qd"))
    terms.agg(count(lit(1)).as("k"), sum(col("__n")).as("n"),
        sum(col("__sd")).cast("double").as("s"),
        sum(col("__qd")).cast("double").as("q"),
        sum(col("__t")).cast("double").as("ssb_part"))
      .select(col("k"), col("n"),
        round({
          val nD = col("n").cast("double")
          val ssb = col("ssb_part") - col("s") * col("s") / nD
          val ssw = col("q") - col("ssb_part")
          val df1 = col("k").cast("double") - 1.0
          val df2 = nD - col("k").cast("double")
          (ssb / df1) / (ssw / df2)
        }, 6).as("f_stat"),
        (col("k") - 1L).as("df1"), (col("n") - col("k")).as("df2"))
  }

  /** Variance explained (η² = SSB/SST) for each of several candidate
    * grouping dimensions — "which dimension actually structures this
    * metric": one exact-decimal moment scan PER dimension (k scans of
    * the same relation — Catalyst caches nothing here, but each scan
    * is one partial-agg groupBy), cross-group sums 6-dp DECIMAL-summed
    * like [[anovaF]]. Returns (dimension, k_levels, eta2) ordered by
    * dimension — compare magnitudes, not significance (q272 owns the
    * F-test). */
  def etaSquared(df: DataFrame, dims: Seq[String], valueCol: String)
      : DataFrame = {
    require(dims.nonEmpty)
    val d386 = DecimalType(38, 6)
    dims.map { dim =>
      val m = df
        .select(col(dim).as("__g"), d184(col(valueCol)).as("__v"))
        .groupBy("__g")
        .agg(count(lit(1)).as("__n"),
          sum(col("__v")).cast("double").as("__s"),
          sum(col("__v") * col("__v")).cast("double").as("__q"))
      m.select(col("__n"),
          round(col("__s"), 6).cast(d386).as("__sd"),
          round(col("__s") * col("__s") / col("__n").cast("double"), 6)
            .cast(d386).as("__t"),
          round(col("__q"), 6).cast(d386).as("__qd"))
        .agg(count(lit(1)).as("k"), sum(col("__n")).as("n"),
          sum(col("__sd")).cast("double").as("s"),
          sum(col("__qd")).cast("double").as("q"),
          sum(col("__t")).cast("double").as("ssb_part"))
        .select(lit(dim).as("dimension"), col("k").as("k_levels"),
          round({
            val nD = col("n").cast("double")
            (col("ssb_part") - col("s") * col("s") / nD) /
              (col("q") - col("s") * col("s") / nD)
          }, 6).as("eta2"))
    }.reduce(_ unionAll _).orderBy("dimension")
  }

  /** Brown–Forsythe test of variance homogeneity across groups — the
    * robust Levene variant: [[anovaF]] applied to each row's absolute
    * deviation from its GROUP MEDIAN (medians from
    * [[Ranks.quantileDisc]]'s exact no-global-sort grid, broadcast
    * back). The gate before trusting a pooled-variance readout. Two
    * scans (thresholds + deviations); |x − med| of 2-dp-valued
    * doubles sits within ~1 ulp of an exact 2-dp point, far from any
    * 4-dp half boundary, so the decimal moments stay engine-exact.
    * Returns (k, n, f_stat, df1, df2). */
  def brownForsythe(df: DataFrame, groupCol: String, valueCol: String)
      : DataFrame = {
    val med = Ranks.quantileDisc(df, groupCol, valueCol, Seq(0.5))
      .select(col(groupCol), col("value").as("__med"))
    val dev = df
      .select(col(groupCol), col(valueCol).cast("double").as("__v"))
      .join(broadcast(med), groupCol)
      .select(col(groupCol), abs(col("__v") - col("__med")).as("__z"))
    anovaF(dev, groupCol, "__z")
  }

  /** CUPED (Deng et al. 2013): variance-reduced experiment readout
    * using a pre-experiment covariate. For unit-level frame
    * (unit, x = pre-period metric, y = in-experiment metric, arm):
    * θ = cov(x, y) / var(x) pooled over BOTH arms (the standard,
    * assignment-independent estimator), ŷ = y − θ·(x − mean(x)), and
    * the readout is per-arm means of y and ŷ plus the raw and adjusted
    * lifts. One partial-agg scan collects per-arm exact decimal
    * moments (n, Σx, Σy, Σxy, Σxx); every float op happens on the
    * 1-row pivoted frame in a fixed expression order, so the result is
    * engine-exact given 2-dp inputs. Returns one row:
    * (n_a, n_b, theta, mean_y_a, mean_y_b, lift_raw, lift_cuped).
    * Precondition: the covariate must vary (var(x) > 0) — a constant
    * pre-period metric makes θ undefined and fails loud under ANSI
    * rather than emitting a NaN readout. */
  def cuped(df: DataFrame, xCol: String, yCol: String, armA: Column)
      : DataFrame = {
    val moments = df
      .select(armA.as("__a"), d184(col(xCol)).as("__x"),
        d184(col(yCol)).as("__y"))
      .groupBy("__a")
      .agg(count(lit(1)).cast("double").as("__n"),
        sum(col("__x")).cast("double").as("__sx"),
        sum(col("__y")).cast("double").as("__sy"),
        sum(col("__x") * col("__y")).cast("double").as("__sxy"),
        sum(col("__x") * col("__x")).cast("double").as("__sxx"))

    def arm(a: Boolean, c: String) = max(when(col("__a") === a, col(c)))

    val wide = moments.groupBy()
      .agg(arm(true, "__n").as("na"), arm(true, "__sx").as("sxa"),
        arm(true, "__sy").as("sya"), arm(true, "__sxy").as("pa"),
        arm(true, "__sxx").as("qa"),
        arm(false, "__n").as("nb"), arm(false, "__sx").as("sxb"),
        arm(false, "__sy").as("syb"), arm(false, "__sxy").as("pb"),
        arm(false, "__sxx").as("qb"))

    val n = col("na") + col("nb")
    val sx = col("sxa") + col("sxb")
    val sy = col("sya") + col("syb")
    val sxy = col("pa") + col("pb")
    val sxx = col("qa") + col("qb")
    val theta = (sxy - sx * sy / n) / (sxx - sx * sx / n)
    val mx = sx / n
    val adjA = col("sya") / col("na") - theta * (col("sxa") / col("na") - mx)
    val adjB = col("syb") / col("nb") - theta * (col("sxb") / col("nb") - mx)
    wide.select(
      col("na").cast("long").as("n_a"), col("nb").cast("long").as("n_b"),
      round(theta, 6).as("theta"),
      round(col("sya") / col("na"), 6).as("mean_y_a"),
      round(col("syb") / col("nb"), 6).as("mean_y_b"),
      round(col("sya") / col("na") - col("syb") / col("nb"), 6).as("lift_raw"),
      round(adjA - adjB, 6).as("lift_cuped"))
  }

  /** Sequential two-proportion monitoring — "when could this A/B have
    * stopped?": the cumulative pooled z statistic on the calendar day
    * grid, with the first boundary crossing |z| ≥ `zBound` reported
    * (the peeking-aware view a fixed-horizon test forbids; constant
    * boundaries à la Pocock). One partial-agg corpus scan to daily
    * 2×2 counts; cumulative counts are exact integers on the
    * calendar-bounded grid (post-aggregate grid window — the blessed
    * shape), so every z is an identical double on both engines and
    * the crossing day is engine-exact. Returns one row (n_days,
    * first_cross_day [null = never], z_final, n_final). */
  def sequentialZ(df: DataFrame, dateCol: String, treat: Column,
      success: Column, zBound: Double): DataFrame = {
    val daily = df
      .select(date_trunc("day", col(dateCol)).cast("date").as("d"),
        treat.as("__t"), success.as("__s"))
      .groupBy("d").agg(
        sum(when(col("__t"), 1L).otherwise(0L)).as("nt"),
        sum(when(col("__t") && col("__s"), 1L).otherwise(0L)).as("st"),
        sum(when(!col("__t"), 1L).otherwise(0L)).as("nc"),
        sum(when(!col("__t") && col("__s"), 1L).otherwise(0L)).as("sc"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("d")
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, org.apache.spark.sql.expressions.Window
        .currentRow)
    val cum = daily
      .select(col("d"), sum(col("nt")).over(w).as("NT"),
        sum(col("st")).over(w).as("ST"),
        sum(col("nc")).over(w).as("NC"),
        sum(col("sc")).over(w).as("SC"))
    val nT = col("NT").cast("double")
    val nC = col("NC").cast("double")
    val p = (col("ST") + col("SC")).cast("double") / (nT + nC)
    // a degenerate prefix (no successes yet, or all successes) has
    // p ∈ {0, 1} → zero pooled variance: DuckDB's float division
    // yields NULL there (filtered below); ANSI Spark would THROW, so
    // guard the division — identical row set in both engines. Seen
    // live at sf0.001 (day-1 prefix with zero conversions).
    val den = sqrt(p * (lit(1.0) - p) * (lit(1.0) / nT + lit(1.0) / nC))
    val z = when(den === 0.0, lit(null).cast("double"))
      .otherwise((col("ST").cast("double") / nT
        - col("SC").cast("double") / nC) / den)
    val withZ = cum
      .filter(col("NT") > 0L && col("NC") > 0L)
      .select(col("d"), col("NT"), col("NC"), z.as("z"))
      .filter(col("z").isNotNull && !isnan(col("z")))
    val firstCross = withZ.filter(abs(col("z")) >= zBound)
      .agg(min(col("d")).as("first_cross_day"))
    val fin = withZ
      .agg(count(lit(1)).as("n_days"),
        max(struct(col("d"), col("z"),
          (col("NT") + col("NC")).as("n"))).as("m"))
      .select(col("n_days"), round(col("m.z"), 6).as("z_final"),
        col("m.n").as("n_final"))
    fin.crossJoin(broadcast(firstCross))
      .select(col("n_days"), col("first_cross_day"), col("z_final"),
        col("n_final"))
  }
}
