package graft.operators

import graft.operators.Ckpt.CkptOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Time-series diagnostics over an aggregated daily grid. The heavy
  * pass is one partial-agg groupBy(day) over the raw stream; every
  * subsequent step (lag joins, moment sums) runs on the DAILY grid,
  * whose cardinality is bounded by the calendar — a 7-year order
  * history is ~2.6 k rows no matter whether the corpus is 1 GB or
  * 100 TB. So the only corpus-sized cost is the first scan, and it is
  * partial-aggregated.
  *
  * Cross-engine determinism: daily sums accumulate in DECIMAL (exact
  * for 2-dp money in any order); the mean is one double division; each
  * centred cross term (x_t−μ)(x_{t+l}−μ) is computed in double from
  * identical operands — hence bit-identical — then rounded to the
  * nearest INTEGER and summed in DECIMAL, so the grid reductions are
  * associativity-free too. Integer (not fractional) term rounding is
  * deliberate: the products sit at ~1e10–1e16 where a double's ulp
  * already exceeds 1e-4, so sub-integer digits are noise — and scaling
  * by 10^dp before rounding would make the two engines' rounding
  * algorithms observable. One rounded division per lag at the end.
  */
object TimeSeries {

  /** Sample autocorrelation of the daily `valueCol` sum at lags
    * 1..`maxLag` — the standard biased estimator
    * r_l = Σ_{t}(x_t−μ)(x_{t+l}−μ) / Σ_t(x_t−μ)², both sums over the
    * observed day grid (missing days are skipped, not zero-filled; use
    * GapFill upstream for a dense grid). Returns (lag, n_pairs, acf)
    * ordered by lag. */
  /** Forecast backtest on the daily grid: naive (x̂_t = x_{t−1}) vs
    * seasonal-naive (x̂_t = x_{t−7}) one-step predictors, scored by
    * MAPE and RMSE over every day with the needed predecessor — the
    * benchmark pair every real forecaster must beat (Hyndman's
    * M-competition floor). If seasonal-naive wins, the series has
    * weekly structure worth modeling (cf. [[dailyAcf]] /
    * [[seasonalIndex]]).
    *
    * Same determinism discipline as [[dailyAcf]]: exact decimal day
    * sums; APE terms are identical doubles rounded to 9 dp, squared
    * errors to integers; both DECIMAL-summed. Returns one row per
    * model: (model, n_days, mape, rmse) ordered by model. */
  def forecastBacktest(df: DataFrame, tsCol: String, valueCol: String)
      : DataFrame = {
    val daily = df
      .select(date_trunc("day", col(tsCol)).as("d"),
        col(valueCol).cast(DecimalType(18, 4)).as("v"))
      .groupBy("d").agg(sum(col("v")).as("xd"))
      .select(col("d"), col("xd").cast("double").as("x"))
      .graftCheckpoint(true)
    val lagged = daily
      .select(col("d"), col("x"),
        explode(array(
          struct(lit("naive1").as("model"), lit(1).as("lag")),
          struct(lit("seasonal7").as("model"), lit(7).as("lag")))).as("m"))
      .select(col("d"), col("x"), col("m.model").as("model"),
        expr("d - make_interval(0, 0, 0, m.lag)").as("dp"))
      .join(daily.select(col("d").as("dp"), col("x").as("xh")), "dp")
      .filter(col("x") > 0.0)
    lagged
      .select(col("model"),
        round(abs(col("x") - col("xh")) / col("x"), 9)
          .cast(DecimalType(28, 9)).as("ape"),
        round((col("x") - col("xh")) * (col("x") - col("xh")), 0)
          .cast(DecimalType(38, 0)).as("se"))
      .groupBy("model")
      .agg(count(lit(1)).as("n_days"),
        (sum(col("ape")).cast("double")).as("sape"),
        (sum(col("se")).cast("double")).as("sse"))
      .select(col("model"), col("n_days"),
        round(col("sape") / col("n_days").cast("double"), 6).as("mape"),
        round(sqrt(col("sse") / col("n_days").cast("double")), 6)
          .as("rmse"))
      .orderBy("model")
  }

  /** CUSUM change-point detection on the daily series (Page 1954 /
    * the Brownian-bridge scan): s_t = Σ_{u≤t}(x_u − μ̂), the change
    * point is argmax_t |s_t| (earliest day on ties) and the
    * normalized statistic is max|s_t| / √Σ(x_u − μ̂)² — ≳1.36 rejects
    * "no change" at 5 % (Kolmogorov). The mean-shift detector for
    * pipeline regressions that drift monitors binned per-batch (PSI,
    * q167) can't localize in time.
    *
    * Determinism: centred terms are bit-identical doubles rounded to
    * 4 dp; the prefix sum and the argmax both run on DECIMALs over the
    * calendar-bounded grid (ties compared exactly, never by float).
    * Returns one row (n_days, change_date, cusum_peak, cusum_stat). */
  def cusumDaily(df: DataFrame, tsCol: String, valueCol: String)
      : DataFrame = {
    val daily = df
      .select(date_trunc("day", col(tsCol)).as("d"),
        col(valueCol).cast(DecimalType(18, 4)).as("v"))
      .groupBy("d").agg(sum(col("v")).as("x"))
      .graftCheckpoint(true)
    val stats = broadcast(daily.agg(count(lit(1)).as("n"),
      sum(col("x")).cast("double").as("sx")))
    val centred = daily.crossJoin(stats)
      .select(col("d"), col("n"),
        (col("x").cast("double") - col("sx") / col("n").cast("double"))
          .as("c"))
    val w = Window.orderBy("d") // calendar-scale grid
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = centred
      .withColumn("s", sum(round(col("c"), 4).cast(DecimalType(38, 4)))
        .over(w))
      .withColumn("q", round(col("c") * col("c"), 0)
        .cast(DecimalType(38, 0)))
    cum.groupBy("n")
      .agg(max(struct(abs(col("s")).as("a"),
          (-unix_timestamp(col("d"))).as("nt"), col("d").as("d"),
          col("s").as("s"))).as("m"),
        sum(col("q")).cast("double").as("den"))
      .select(col("n").as("n_days"), col("m.d").as("change_date"),
        round(col("m.s").cast("double"), 6).as("cusum_peak"),
        // a constant series has zero variance: no change point exists
        // and the statistic is undefined — null, not an ANSI error
        when(col("den") === 0.0, lit(null).cast("double"))
          .otherwise(round(abs(col("m.s").cast("double"))
            / sqrt(col("den")), 6)).as("cusum_stat"))
  }

  /** Theil–Sen robust trend of the daily series: the MEDIAN of all
    * pairwise slopes (x_j − x_i)/(t_j − t_i), breakdown point 29 % —
    * the outlier-proof answer to "is revenue actually growing?".
    * Intercept = median(x_i − slope·t_i) (the classic companion).
    *
    * The pairwise relation is CALENDAR² — bounded by observation days
    * squared, independent of corpus size (a 7-year history is ~3 M
    * pairs) — and both medians run on the exact value-grid selection
    * (`Ranks.quantileDisc`'s convention: lower median, ceil(n/2)).
    * Slopes are bit-identical doubles in both engines (exact decimal
    * daily sums, integer day distances). Returns one row
    * (n_days, n_pairs, slope_per_day, intercept). */
  def theilSenDaily(df: DataFrame, tsCol: String, valueCol: String,
      driverDaysUpTo: Int = 8192): DataFrame = {
    // ONE corpus pass reduces to the calendar-grid daily series;
    // everything after is calendar-bounded, not corpus-bounded
    val daily = df
      .select(date_trunc("day", col(tsCol)).as("d"),
        col(valueCol).cast(DecimalType(18, 4)).as("v"))
      .groupBy("d").agg(sum(col("v")).as("x"))
      .select(datediff(col("d"), lit("1970-01-01").cast("date")).as("t"),
        col("x").cast("double").as("x"))
      .graftCheckpoint(false)
    // Up to `driverDaysUpTo` observation days (8192 days ≈ 22 years ≈
    // 33M pairs ≈ 270 MB of driver doubles), the whole pairwise stage
    // is METADATA-sized: collect the daily grid once and run both
    // exact medians on the driver — identical IEEE double algebra
    // ((xj−xi)/(tj−ti), x−slope·t) and the same ceil(p·n) grid
    // selection rule as Ranks.quantileDisc, so values are bit-equal to
    // the distributed path's. One scheduled job instead of ~20.
    val dRows = daily.limit(driverDaysUpTo + 1).collect()
    if (dRows.length <= driverDaysUpTo) {
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types._
      // < 2 observation days ⇒ no pairs, both medians undefined: the
      // distributed branch yields the EMPTY frame (quantileDisc of an
      // empty pair relation), so the fast path must too — not an
      // ArrayIndexOutOfBounds from medianDisc on an empty slope array.
      if (dRows.length < 2) return daily.sparkSession.createDataFrame(
        java.util.Collections.emptyList[Row](),
        StructType(Seq(
          StructField("n_days", LongType, nullable = false),
          StructField("n_pairs", LongType, nullable = false),
          StructField("slope_per_day", DoubleType, nullable = false),
          StructField("intercept", DoubleType, nullable = false))))
      val ts = dRows.map(_.getInt(0))
      val xs = dRows.map(_.getDouble(1))
      val n = dRows.length
      val slopes = new Array[Double](n * (n - 1) / 2)
      var k = 0
      var i = 0
      while (i < n) {
        var j = 0
        while (j < n) {
          // mirror the engine predicate tj > ti exactly (distinct
          // days, so this is i != j with the larger t as j)
          if (ts(j) > ts(i)) { slopes(k) = (xs(j) - xs(i)) / (ts(j) - ts(i)).toDouble; k += 1 }
          j += 1
        }
        i += 1
      }
      def medianDisc(a: Array[Double]): Double = {
        java.util.Arrays.sort(a) // quantile_disc: value at rank ⌈p·n⌉
        a(math.ceil(0.5 * a.length).toInt - 1)
      }
      val slope = medianDisc(slopes)
      val resid = Array.tabulate(n)(i => xs(i) - slope * ts(i))
      val intercept = medianDisc(resid)
      def r6(v: Double): Double = // Spark round(_, 6): HALF_UP on the
        java.math.BigDecimal.valueOf(v) // shortest-repr decimal
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      daily.sparkSession.createDataFrame(
        java.util.Arrays.asList(
          Row(n.toLong, slopes.length.toLong, r6(slope), r6(intercept))),
        StructType(Seq(
          StructField("n_days", LongType, nullable = false),
          StructField("n_pairs", LongType, nullable = false),
          StructField("slope_per_day", DoubleType, nullable = false),
          StructField("intercept", DoubleType, nullable = false))))
    } else {
      // distributed fallback: the calendar² pair relation + the
      // no-global-sort quantile machinery (lazy checkpoints — see
      // Ranks.quantileDisc on why not persists)
      val pairs = daily.select(col("t").as("ti"), col("x").as("xi"))
        .join(daily.select(col("t").as("tj"), col("x").as("xj")),
          col("tj") > col("ti"))
        .select(((col("xj") - col("xi"))
          / (col("tj") - col("ti")).cast("double")).as("s"))
        .graftCheckpoint(false)
      val slope = Ranks.quantileDisc(
        pairs.withColumn("g", lit("all")), "g", "s", Seq(0.5))
        .select(col("value").as("slope"))
      val interc = daily.crossJoin(broadcast(slope))
        .select(col("slope"), (col("x") - col("slope") * col("t")).as("r"))
      val intercept = Ranks.quantileDisc(
        interc.withColumn("g", lit("all")), "g", "r", Seq(0.5))
        .select(col("value").as("intercept"))
      daily.agg(count(lit(1)).as("n_days"))
        .crossJoin(broadcast(pairs.agg(count(lit(1)).as("n_pairs"))))
        .crossJoin(broadcast(slope))
        .crossJoin(broadcast(intercept))
        .select(col("n_days"), col("n_pairs"),
          round(col("slope"), 6).as("slope_per_day"),
          round(col("intercept"), 6).as("intercept"))
    }
  }

  /** Day-of-week seasonal index: for each dow (0 = Sunday … 6), the
    * mean DAILY total divided by the overall mean daily total — the
    * multiplicative seasonality profile (1.0 = flat). Same scale shape
    * as [[dailyAcf]]: one partial-agg scan to the calendar-bounded
    * daily grid; daily totals are exact decimals, the two divisions
    * are identical expressions per dow row. Returns
    * (dow, n_days, mean_daily, seasonal_index) ordered by dow. */
  def seasonalIndex(df: DataFrame, tsCol: String, valueCol: String)
      : DataFrame = {
    val daily = df
      .select(date_trunc("day", col(tsCol)).as("d"),
        col(valueCol).cast(DecimalType(18, 4)).as("v"))
      .groupBy("d").agg(sum(col("v")).as("x"))
      .graftCheckpoint(true)
    val overall = daily.agg(count(lit(1)).cast("double").as("nd"),
      sum(col("x")).cast("double").as("sx"))
    daily
      .groupBy((dayofweek(col("d")) - 1).as("dow"))
      .agg(count(lit(1)).as("n_days"), sum(col("x")).cast("double").as("s"))
      .crossJoin(broadcast(overall))
      .select(col("dow"), col("n_days"),
        round(col("s") / col("n_days").cast("double"), 6).as("mean_daily"),
        round((col("s") / col("n_days").cast("double"))
          / (col("sx") / col("nd")), 6).as("seasonal_index"))
      .orderBy("dow")
  }

  def dailyAcf(df: DataFrame, tsCol: String, valueCol: String,
      maxLag: Int): DataFrame = {
    require(maxLag >= 1)
    val daily = df
      .select(date_trunc("day", col(tsCol)).as("d"),
        col(valueCol).cast(DecimalType(18, 4)).as("v"))
      .groupBy("d").agg(sum(col("v")).as("x"))
      .graftCheckpoint(true) // calendar-scale; reused by stats + lag legs
    val stats = daily.agg(count(lit(1)).cast("double").as("n"),
      sum(col("x")).cast("double").as("sx"))
    val mu = (col("sx") / col("n")).as("mu")
    val centred = daily.crossJoin(broadcast(stats.select(mu)))
      .select(col("d"), (col("x").cast("double") - col("mu")).as("c"))
      .graftCheckpoint(true)
    val den = centred
      .agg(sum(round(col("c") * col("c"), 0).cast(DecimalType(28, 0)))
        .cast("double").as("den"))
    val lags = (1 to maxLag).map(l => lit(l)).toArray
    val pairs = centred
      .select(col("d"), col("c"), explode(array(lags: _*)).as("lag"))
      .withColumn("d2", expr("d + make_interval(0, 0, 0, lag)"))
      .join(centred.select(col("d").as("d2"), col("c").as("c2")), "d2")
    pairs.groupBy("lag")
      .agg(count(lit(1)).as("n_pairs"),
        sum(round(col("c") * col("c2"), 0).cast(DecimalType(28, 0)))
          .cast("double").as("num"))
      .crossJoin(broadcast(den))
      .select(col("lag").cast("int").as("lag"), col("n_pairs"),
        round(col("num") / col("den"), 6).as("acf"))
      .orderBy("lag")
  }

  /** Additive seasonal decomposition (classical, not loess): trend =
    * CENTERED 7-day moving average, seasonal = day-of-week mean of
    * the detrended series, remainder variance — "how much of the
    * wiggle is just the weekly cycle?" The grid windows are
    * calendar-bounded; detrended values are bit-identical doubles
    * whose 6-dp rounding is boundary-free (true values are rationals
    * with denominator 700 — never an odd multiple of 5·10⁻⁷), so the
    * per-dow means reduce over DECIMAL. Returns 7 rows
    * (dow, n_days, seasonal, mean_abs_remainder) ordered by dow;
    * only days with a full centered window participate. */
  def seasonalDecompose(df: DataFrame, tsCol: String, valueCol: String)
      : DataFrame = {
    val d286 = DecimalType(28, 6)
    val daily = df
      .select(date_trunc("day", col(tsCol)).as("d"),
        col(valueCol).cast(DecimalType(18, 2)).as("v"))
      .groupBy("d").agg(sum(col("v")).as("x"))
      .graftCheckpoint(true)
    val w = Window.orderBy("d").rowsBetween(-3, 3)
    val det = daily
      .withColumn("n7", count(lit(1)).over(w))
      .withColumn("s7", sum(col("x")).over(w))
      .filter(col("n7") === 7)
      .select(col("d"),
        round(col("x").cast("double")
          - col("s7").cast("double") / lit(7.0), 6).cast(d286)
          .as("det"))
      .graftCheckpoint(true)
    val seas = det
      .groupBy((dayofweek(col("d")) - 1).as("dow"))
      .agg(count(lit(1)).as("n_days"), sum(col("det")).as("sd"))
      .select(col("dow"), col("n_days"),
        round(col("sd").cast("double") / col("n_days").cast("double"),
          6).as("seasonal"))
    det.join(broadcast(seas),
        (dayofweek(col("d")) - 1) === seas("dow"))
      .select(col("dow"), col("n_days"), col("seasonal"),
        round(abs(col("det").cast("double") - col("seasonal")), 6)
          .cast(d286).as("__r"))
      .groupBy("dow", "n_days", "seasonal")
      .agg(sum(col("__r")).cast("double").as("__sr"))
      .select(col("dow"), col("n_days"), col("seasonal"),
        round(col("__sr") / col("n_days").cast("double"), 6)
          .as("mean_abs_remainder"))
      .orderBy("dow")
  }

  /** Partial autocorrelation at lags 1–3 by the Durbin–Levinson
    * closed forms over [[dailyAcf]]'s ROUNDED r₁..r₃ — the AR-order
    * fingerprint (an AR(p) series has pacf ≈ 0 past lag p) beside the
    * raw ACF. Feeding the 6-dp-rounded acf values is deliberate: both
    * engines share bit-identical inputs, and the three rational
    * formulas below are mirrored verbatim in oracles. No new corpus
    * work — one extra 1-row pivot over the lag frame. Returns one row
    * (pacf1, pacf2, pacf3). */
  def pacfDaily(df: DataFrame, tsCol: String, valueCol: String)
      : DataFrame = {
    val r = dailyAcf(df, tsCol, valueCol, maxLag = 3)
      .groupBy()
      .agg(max(when(col("lag") === 1, col("acf"))).as("r1"),
        max(when(col("lag") === 2, col("acf"))).as("r2"),
        max(when(col("lag") === 3, col("acf"))).as("r3"))
    val p2 = (col("r2") - col("r1") * col("r1")) /
      (lit(1.0) - col("r1") * col("r1"))
    val a21 = col("r1") - p2 * col("r1")
    val p3 = (col("r3") - a21 * col("r2") - p2 * col("r1")) /
      (lit(1.0) - a21 * col("r1") - p2 * col("r2"))
    r.select(round(col("r1"), 6).as("pacf1"),
      round(p2, 6).as("pacf2"), round(p3, 6).as("pacf3"))
  }

  /** Holt linear-trend one-step backtest vs naive — does modeling a
    * TREND beat last-value carryover ([[forecastBacktest]]'s naive1)?
    * α = β = 1/2 with all state in exact integer CENTS: level
    * l_t = (x_t + (l+b)) quot 2 and trend b_t = (b + (l_t − l)) quot 2
    * use TRUNCATING division (Java long `/` ≡ DuckDB `//` — floor
    * would disagree on the negative trend states), so both engines
    * replay the two-state recurrence bit-for-bit. Forecast errors
    * x_t − (l+b) are exact integers; MAE/RMSE sums run in
    * DECIMAL(38,0) (squared cent errors pass 2^63 on ~$10 M misses).
    * Same driver-side calendar fold as [[ewmaControl]]. Returns
    * (model, n_days, mae, rmse) for 'holt' and 'naive1', days 2+. */
  def holtBacktest(df: DataFrame, tsCol: String, valueCol: String)
      : DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val daily = df
      .select(date_trunc("day", col(tsCol)).as("d"),
        col(valueCol).cast(DecimalType(18, 2)).as("v"))
      .groupBy("d").agg((sum(col("v")) * 100).cast("long").as("u"))
    val grid = daily.orderBy("d").collect().map(_.getLong(1))
    require(grid.length >= 2, "need at least 2 days")
    var l = grid(0); var b = 0L
    var (nH, saH, ssH) = (0L, BigInt(0), BigInt(0))
    var (nN, saN, ssN) = (0L, BigInt(0), BigInt(0))
    grid.zipWithIndex.drop(1).foreach { case (x, i) =>
      val f = l + b
      val eH = x - f
      val eN = x - grid(i - 1)
      nH += 1; saH += eH.abs; ssH += BigInt(eH) * BigInt(eH)
      nN += 1; saN += eN.abs; ssN += BigInt(eN) * BigInt(eN)
      val l2 = (x + (l + b)) / 2
      b = (b + (l2 - l)) / 2
      l = l2
    }
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // cents → dollars: |e|/100 summed exactly, then one double divide;
    // squared errors /10000 likewise — identical expression in oracles
    def row(m: String, n: Long, sa: BigInt, ss: BigInt) =
      (m, n, r6(sa.toDouble / 100.0 / n.toDouble),
        r6(math.sqrt(ss.toDouble / 10000.0 / n.toDouble)))
    Seq(row("holt", nH, saH, ssH), row("naive1", nN, saN, ssN))
      .toDF("model", "n_days", "mae", "rmse").orderBy("model")
  }

  /** Bollinger bands on the daily grid: trailing 7-day mean ± 2σ with
    * breach flags — the rolling-window anomaly view beside
    * [[ewmaControl]]'s recursive one. The rolling count/Σx/Σx² are
    * DECIMAL window sums over the CALENDAR grid (exact in any order);
    * mean/σ/band comparisons are identical double expressions per
    * row. Only full 7-day windows emit rows. Returns
    * (d, revenue, ma7, sd7, breach) ordered by d. */
  def bollingerDaily(df: DataFrame, tsCol: String, valueCol: String)
      : DataFrame = {
    val daily = df
      .select(date_trunc("day", col(tsCol)).as("d"),
        col(valueCol).cast(DecimalType(18, 2)).as("v"))
      .groupBy("d").agg(sum(col("v")).as("x"))
      .graftCheckpoint(true)
    val w = Window.orderBy("d").rowsBetween(-6, 0)
    val roll = daily
      .withColumn("n7", count(lit(1)).over(w))
      .withColumn("s7", sum(col("x")).over(w))
      .withColumn("q7", sum(col("x") * col("x")).over(w))
      .filter(col("n7") === 7)
    val mean = col("s7").cast("double") / lit(7.0)
    val sd = sqrt((col("q7").cast("double")
      - col("s7").cast("double") * col("s7").cast("double") / lit(7.0))
      / lit(6.0))
    roll.select(col("d"), col("x").cast("double").as("revenue"),
        round(mean, 6).as("ma7"), round(sd, 6).as("sd7"),
        (col("x").cast("double") > mean + lit(2.0) * sd ||
          col("x").cast("double") < mean - lit(2.0) * sd).as("breach"))
      .orderBy("d")
  }

  /** EWMA control chart on the daily grid (α = 1/2): e_t =
    * ⌊(x_t + e_{t−1}) / 2⌋ in exact integer cents, alarm when the
    * one-step surprise |x_t − e_{t−1}| exceeds `l`·σ of the daily
    * totals — the classic "is today's number believable" monitor
    * beside [[cusumDaily]]'s offline change-point. The recurrence is
    * sequential by nature, so it runs DRIVER-SIDE over the collected
    * calendar grid (~2.6k rows for 7 years — metadata, the
    * [[Pca]]/[[Coreset]] precedent; the corpus pass is still the one
    * partial-agg groupBy(day)). Floor-halving in integer cents keeps
    * every state exact — no float enters the recurrence, so a
    * recursive-CTE oracle replays it bit-for-bit. Returns
    * (d, revenue, ewma, alarm) ordered by d; day 1 seeds e_1 = x_1
    * and never alarms. */
  def ewmaControl(df: DataFrame, tsCol: String, valueCol: String,
      l: Double = 2.0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val daily = df
      .select(date_trunc("day", col(tsCol)).as("d"),
        col(valueCol).cast(DecimalType(18, 2)).as("v"))
      .groupBy("d").agg((sum(col("v")) * 100).cast("long").as("u"))
      .graftCheckpoint(true)
    val st = daily.agg(count(lit(1)).as("n"), sum(col("u")).as("s"),
        sum(col("u").cast(DecimalType(38, 0)) * col("u"))
          .cast("double").as("q"))
      .collect().head
    val (n, s, q) = (st.getLong(0), st.getLong(1), st.getDouble(2))
    // identical expression text in the oracle: same IEEE ops → same σ
    val sigma = math.sqrt(
      (q - s.toDouble * s.toDouble / n.toDouble) / (n.toDouble - 1.0))
    val grid = daily.orderBy("d").collect()
      .map(r => (r.getTimestamp(0), r.getLong(1)))
    var e = 0L
    val out = grid.zipWithIndex.map { case ((d, x), i) =>
      val alarm = i > 0 && math.abs(x - e).toDouble > l * sigma
      e = if (i == 0) x else Math.floorDiv(x + e, 2L)
      (d, x.toDouble / 100.0, e.toDouble / 100.0, alarm)
    }
    out.toSeq.toDF("d", "revenue", "ewma", "alarm").orderBy("d")
  }

  /** Seasonal Mann–Kendall (Hirsch & Slack 1984, the
    * independent-seasons form) — [[mannKendallDaily]] restricted to
    * WITHIN-stratum pairs (stratum = t mod `period`, the pure-integer
    * weekday/season key both engines compute identically): a strong
    * weekly cycle no longer masks or fakes a trend, because Mondays
    * only ever compare with Mondays. S and the tie-corrected 18·Var
    * sum over strata; the same ±1 continuity correction and exactness
    * discipline as the unstratified test. Pairs are Σ_h n_h² ≤
    * calendar²/period. Returns (n_days, s_stat, z). */
  def seasonalMannKendallDaily(df: DataFrame, tsCol: String,
      valueCol: String, period: Int = 7): DataFrame = {
    require(period >= 1, "period >= 1")
    val daily = df
      .select(date_trunc("day", col(tsCol)).as("d"),
        col(valueCol).cast(DecimalType(18, 4)).as("v"))
      .groupBy("d").agg(sum(col("v")).as("x"))
      .select((datediff(col("d"), lit("1970-01-01").cast("date"))
        % period).as("h"),
        datediff(col("d"), lit("1970-01-01").cast("date")).as("t"),
        col("x"))
      .graftCheckpoint(false) // pair join sides + stratum tie groups
    val s = broadcast(daily
      .select(col("h"), col("t").as("t1"), col("x").as("x1"))
      .join(broadcast(daily.select(col("h"), col("t").as("t2"),
        col("x").as("x2"))), Seq("h"))
      .filter(col("t1") < col("t2"))
      .agg(coalesce(sum(when(col("x2") > col("x1"), 1L)
        .when(col("x2") < col("x1"), -1L).otherwise(0L)), lit(0L))
        .as("s")))
    val perStrat = daily.groupBy("h", "x").agg(count(lit(1)).as("tp"))
      .groupBy("h").agg(sum(col("tp")).as("nh"),
        coalesce(sum(col("tp") * (col("tp") - 1)
          * (lit(2) * col("tp") + lit(5))), lit(0L)).as("tsum"))
    val v = broadcast(perStrat.agg(sum(col("nh")).as("n"),
      coalesce(sum(col("nh") * (col("nh") - 1)
        * (lit(2) * col("nh") + lit(5)) - col("tsum")), lit(0L))
        .as("v18")))
    s.crossJoin(v)
      .select(col("n").as("n_days"), col("s").as("s_stat"),
        when(col("v18") === 0, lit(0.0))
          .otherwise(when(col("s") > 0,
            round((col("s") - 1).cast("double")
              / sqrt(col("v18").cast("double") / 18.0), 6) + lit(0.0))
          .otherwise(when(col("s") < 0,
            round((col("s") + 1).cast("double")
              / sqrt(col("v18").cast("double") / 18.0), 6) + lit(0.0))
          .otherwise(lit(0.0)))).as("z"))
  }

  /** Wald–Wolfowitz runs test on the daily up/down moves — the
    * RANDOMNESS companion to [[mannKendallDaily]]'s monotone trend:
    * too FEW runs of consecutive same-sign day-over-day changes means
    * momentum/trending, too MANY means oscillation, and a fair
    * sequence of n₊ ups and n₋ downs has
    * μ_R = 2n₊n₋/N + 1, σ²_R = 2n₊n₋(2n₊n₋ − N)/(N²(N−1)).
    * Flat days (exact-decimal tie) drop, the standard treatment. The
    * corpus reduces to the calendar day grid; both windows (lag for
    * the signs, lag for the run breaks) run over that
    * calendar-bounded frame. R, n₊, n₋ are exact integers; z is the
    * one token-identical float, +0.0-normalized; a degenerate
    * sequence (σ² ≤ 0: fewer than 2 of either sign) reports null.
    * Returns (n_moves, n_up, n_down, runs, z). */
  def runsTestDaily(df: DataFrame, tsCol: String, valueCol: String)
      : DataFrame = {
    val daily = df
      .select(date_trunc("day", col(tsCol)).as("d"),
        col(valueCol).cast(DecimalType(18, 4)).as("v"))
      .groupBy("d").agg(sum(col("v")).as("x"))
      .select(datediff(col("d"), lit("1970-01-01").cast("date"))
        .as("t"), col("x"))
    val w = Window.orderBy("t")
    val moves = daily
      .select(col("t"), when(col("x") > lag(col("x"), 1).over(w), 1)
        .when(col("x") < lag(col("x"), 1).over(w), -1)
        .otherwise(lit(null)).as("s"))
      .filter(col("s").isNotNull)
    val runsMarked = moves
      .select(col("s"), when(lag(col("s"), 1).over(w).isNull
        || lag(col("s"), 1).over(w) =!= col("s"), 1L).otherwise(0L)
        .as("brk"))
    runsMarked.agg(count(lit(1)).as("n_moves"),
        sum(when(col("s") === 1, 1L).otherwise(0L)).as("n_up"),
        sum(when(col("s") === -1, 1L).otherwise(0L)).as("n_down"),
        coalesce(sum(col("brk")), lit(0L)).as("runs"))
      .select(col("n_moves"), col("n_up"), col("n_down"), col("runs"),
        when(expr("2 * n_up * n_down * (2 * n_up * n_down - n_moves)")
            <= 0 || col("n_moves") < 2, lit(null).cast("double"))
          .otherwise(round(
            (col("runs").cast("double")
              - (lit(2.0) * col("n_up") * col("n_down")
                / col("n_moves").cast("double") + lit(1.0)))
              / sqrt(lit(2.0) * col("n_up") * col("n_down")
                * (lit(2.0) * col("n_up") * col("n_down")
                  - col("n_moves").cast("double"))
                / (col("n_moves").cast("double")
                  * col("n_moves").cast("double")
                  * (col("n_moves").cast("double") - lit(1.0)))), 6)
            + lit(0.0)).as("z"))
  }

  /** Mann–Kendall trend test (Mann 1945 / Kendall 1975) on the daily
    * series — the SIGNIFICANCE companion to [[theilSenDaily]]'s slope
    * (the standard monitoring pairing: Sen estimates the trend, MK
    * tests it): S = Σ_{i<j} sign(x_j − x_i) over the calendar-ordered
    * days, tie-corrected variance
    * 18·Var = n(n−1)(2n+5) − Σ_p t_p(t_p−1)(2t_p+5), and the
    * ±1-continuity-corrected z. One corpus pass reduces to the
    * calendar grid of exact DECIMAL day sums, so every sign and every
    * tie group is engine-exact; the pairwise stage is calendar²
    * (q244's bound), and the one float step (z) is token-identical +
    * +0.0-normalized. A constant series (v18 = 0 forces S = 0) is
    * z = 0, not a division blow-up. Returns (n_days, s_stat, z). */
  def mannKendallDaily(df: DataFrame, tsCol: String, valueCol: String)
      : DataFrame = {
    val daily = df
      .select(date_trunc("day", col(tsCol)).as("d"),
        col(valueCol).cast(DecimalType(18, 4)).as("v"))
      .groupBy("d").agg(sum(col("v")).as("x"))
      .select(datediff(col("d"), lit("1970-01-01").cast("date"))
        .as("t"), col("x"))
      .graftCheckpoint(false) // pair join (both sides) + tie groups
    val s = broadcast(daily.select(col("t").as("t1"), col("x").as("x1"))
      .join(broadcast(daily.select(col("t").as("t2"),
        col("x").as("x2"))), col("t1") < col("t2"))
      .agg(coalesce(sum(when(col("x2") > col("x1"), 1L)
        .when(col("x2") < col("x1"), -1L).otherwise(0L)), lit(0L))
        .as("s")))
    val ties = broadcast(daily.groupBy("x")
      .agg(count(lit(1)).as("tp"))
      .agg(count(lit(1)).as("n"),
        coalesce(sum(col("tp") * (col("tp") - 1)
          * (lit(2) * col("tp") + lit(5))), lit(0L)).as("tsum")))
    // n here counts tie GROUPS; recover day count from the grid
    val nDays = broadcast(daily.agg(count(lit(1)).as("n")))
    s.crossJoin(nDays).crossJoin(ties.select(col("tsum")))
      .select(col("n").as("n_days"), col("s").as("s_stat"),
        expr("n * (n - 1) * (2 * n + 5) - tsum").as("v18"))
      .select(col("n_days"), col("s_stat"),
        when(col("v18") === 0, lit(0.0))
          .otherwise(when(col("s_stat") > 0,
            round((col("s_stat") - 1).cast("double")
              / sqrt(col("v18").cast("double") / 18.0), 6) + lit(0.0))
          .otherwise(when(col("s_stat") < 0,
            round((col("s_stat") + 1).cast("double")
              / sqrt(col("v18").cast("double") / 18.0), 6) + lit(0.0))
          .otherwise(lit(0.0)))).as("z"))
  }
}
