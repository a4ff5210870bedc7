package graft.operators

import graft.operators.Ckpt.CkptOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global ranking — the primitive behind rank-based
  * statistics (Mann–Whitney, Spearman, percentile-of-score) that is
  * usually written as `row_number() OVER (ORDER BY v)` and therefore
  * serializes the WHOLE relation onto one task. Here the global order
  * is recovered from a value-monotone bucketing: per-bucket counts
  * (a metadata-sized grid) → exclusive prefix offsets (window over
  * ≤ nBuckets rows) → broadcast back → local rank within bucket +
  * offset. Each task ranks ≈ N/nBuckets rows; no corpus-wide window
  * ever exists — the same bucketed-prefix-sum shape as
  * [[graft.pipeline.Sampling]]'s admission operators.
  *
  * The bucket function only has to be monotone and deterministic in
  * the value (equal values → equal bucket); it does NOT need an
  * engine mirror, because the OUTPUT (ranks) is bucket-agnostic —
  * oracles check against a plain SQL window. */
object Ranks {

  /** Global row number of every row by (value, id) ascending — a total
    * order with the id as deterministic tiebreak. Adds `rank`
    * (1-based, long). */
  def globalRowNumber(df: DataFrame, valueCol: String, idCol: String,
      nBuckets: Int = 1024): DataFrame = {
    require(nBuckets >= 2, "need nBuckets >= 2")
    val v = col(valueCol).cast("double")
    val bounds = df.agg(min(v).as("__lo"), max(v).as("__hi"))
    val withB = df.join(broadcast(bounds))
      .withColumn("__b",
        when(col("__hi") === col("__lo"), lit(0))
          .otherwise(least(lit(nBuckets - 1),
            floor((v - col("__lo")) / (col("__hi") - col("__lo"))
              * nBuckets).cast("int"))))
      .drop("__lo", "__hi")
    val wGrid = Window.orderBy(col("__b").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefixes = withB.groupBy("__b").agg(count(lit(1)).as("__bn"))
      .withColumn("__pre", coalesce(sum("__bn").over(wGrid), lit(0L)))
      .select(col("__b"), col("__pre"))
    val wLocal = Window.partitionBy("__b")
      .orderBy(v.asc, col(idCol).asc)
    withB.join(broadcast(prefixes), "__b")
      .withColumn("rank", col("__pre") + row_number().over(wLocal))
      .select(df.columns.map(col).toIndexedSeq :+ col("rank"): _*)
  }

  /** Value-level average ranks with ties — (v, n_v, avg_rank) where
    * avg_rank is the mean rank a tie group would take under `ORDER BY
    * v` (= count-below + (n_v+1)/2, exact binary halves). The
    * corpus-scale input reduces to DISTINCT values in one groupBy;
    * counts-below come from the bucketed prefix, never a global
    * window. */
  def valueAvgRanks(perValue: DataFrame, nBuckets: Int): DataFrame = {
    val bounds = perValue.agg(min(col("v")).as("__lo"),
      max(col("v")).as("__hi"))
    val withB = perValue.join(broadcast(bounds))
      .withColumn("__b",
        when(col("__hi") === col("__lo"), lit(0))
          .otherwise(least(lit(nBuckets - 1),
            floor((col("v") - col("__lo"))
              / (col("__hi") - col("__lo")) * nBuckets).cast("int"))))
      .drop("__lo", "__hi")
    val wGrid = Window.orderBy(col("__b").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefixes = withB.groupBy("__b").agg(sum(col("n_v")).as("__bn"))
      .withColumn("__pre", coalesce(sum("__bn").over(wGrid), lit(0L)))
      .select(col("__b"), col("__pre"))
    val wLocal = Window.partitionBy("__b").orderBy(col("v").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    withB.join(broadcast(prefixes), "__b")
      .withColumn("below",
        col("__pre") + coalesce(sum(col("n_v")).over(wLocal), lit(0L)))
      .withColumn("avg_rank",
        col("below").cast("double")
          + (col("n_v").cast("double") + 1.0) / 2.0)
  }

  /** Spearman rank correlation (tie-aware): Pearson over the two
    * columns' average ranks. Each column's rank table is VALUE-LEVEL
    * (distinct values + bucketed prefix — no global sort); rows join
    * their ranks back by value, and the correlation is one moment
    * aggregation. Rank sums are sums of exact binary halves/quarters
    * — association-free at fixture scales (≳2^53 rank-products, note,
    * is where a decimal ladder would take over). */
  def spearman(df: DataFrame, col1: String, col2: String,
      nBuckets: Int = 1024): DataFrame = {
    val src = df.select(col(col1).cast("double").as("v1"),
      col(col2).cast("double").as("v2"))
    def ranksOf(c: String): DataFrame =
      valueAvgRanks(
        src.groupBy(col(c).as("v")).agg(count(lit(1)).as("n_v")),
        nBuckets)
        .select(col("v").as(c), col("avg_rank").as(s"r_$c"))
    val ranked = src
      .join(ranksOf("v1"), "v1")
      .join(ranksOf("v2"), "v2")
    ranked.agg(
        count(lit(1)).cast("double").as("n"),
        sum(col("r_v1")).as("sa"),
        sum(col("r_v2")).as("sb"),
        sum(col("r_v1") * col("r_v2")).as("sab"),
        sum(col("r_v1") * col("r_v1")).as("saa"),
        sum(col("r_v2") * col("r_v2")).as("sbb"))
      .select(col("n").cast("long").as("n"),
        round(
          (col("sab") / col("n")
            - (col("sa") / col("n")) * (col("sb") / col("n")))
          / sqrt(
            (col("saa") / col("n")
              - (col("sa") / col("n")) * (col("sa") / col("n")))
            * (col("sbb") / col("n")
              - (col("sb") / col("n")) * (col("sb") / col("n")))),
          6).as("spearman"))
  }

  /** Mann–Whitney U (two-sided, normal approximation, tie-corrected):
    * the nonparametric "are these two groups from the same
    * distribution" test — the A/B gate when values are skewed and a
    * Welch t-test's mean is the wrong summary. All rank math runs on
    * VALUE-LEVEL aggregates (one groupBy to (value, per-group counts),
    * then the bucketed prefix for count-below), so the corpus is
    * scanned once and nothing corpus-sized is ever windowed or
    * sorted. Average ranks for ties are exact halves (binary-exact
    * doubles — sums are association-free).
    *
    * Returns one row: n_a, n_b, u_a, z (rounded 6). |z| ≳ 1.96 ⇒
    * reject at 5%. */
  def mannWhitney(df: DataFrame, valueCol: String, groupCol: String,
      groupA: String, groupB: String, nBuckets: Int = 1024)
      : DataFrame = {
    val v = col(valueCol).cast("double")
    val two = df
      .filter(col(groupCol).isin(groupA, groupB))
      .select(v.as("v"), (col(groupCol) === groupA).as("isA"))
    // value-level aggregation: per distinct value, per-group counts
    val perValue = two.groupBy("v").agg(
      sum(when(col("isA"), 1L).otherwise(0L)).as("na_v"),
      count(lit(1)).as("n_v"))
    // count of rows strictly below each value: bucketed prefix over the
    // value-level relation (distinct values can be corpus-scale);
    // average rank of a tie group = below + (n_v + 1)/2 — exact halves
    val ranked = valueAvgRanks(perValue, nBuckets)
    ranked.agg(
        sum(col("na_v")).as("n_a"),
        sum(col("n_v") - col("na_v")).as("n_b"),
        sum(col("na_v").cast("double") * col("avg_rank")).as("r_a"),
        sum(col("n_v").cast("double") * col("n_v").cast("double")
          * col("n_v").cast("double") - col("n_v").cast("double"))
          .as("tie3"))
      .select(col("n_a"), col("n_b"),
        (col("r_a") - col("n_a").cast("double")
          * (col("n_a").cast("double") + 1.0) / 2.0).as("u_a"),
        col("tie3"))
      .select(col("n_a"), col("n_b"), round(col("u_a"), 6).as("u_a"),
        round({
          val na = col("n_a").cast("double")
          val nb = col("n_b").cast("double")
          val n = na + nb
          val mu = na * nb / 2.0
          val sigma2 = na * nb / 12.0 *
            ((n + 1.0) - col("tie3") / (n * (n - 1.0)))
          (col("u_a") - mu) / sqrt(sigma2)
        }, 6).as("z"))
  }

  /** Kruskal–Wallis H (tie-corrected) across ALL levels of `groupCol`
    * — the k-group rank ANOVA generalizing [[mannWhitney]]: are the k
    * distributions stochastically equal? All rank math runs on
    * VALUE-LEVEL aggregates: one groupBy to the (group, value) grid,
    * average ranks from [[valueAvgRanks]]'s bucketed prefix (exact
    * binary halves — rank sums are association-free below ~2^52), and
    * per-group R_g²/n_g terms — bit-identical IEEE doubles in both
    * engines — are 6-dp DECIMAL-summed so the k-fold float sum has no
    * order sensitivity (above 2^52 the round is the identity because
    * such doubles are integers). H ≳ χ²_{k−1,0.95} ⇒ reject. Returns
    * one row (k, n, h). */
  def kruskalWallis(df: DataFrame, valueCol: String, groupCol: String,
      nBuckets: Int = 1024): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val d386 = DecimalType(38, 6)
    val src = df.select(col(groupCol).as("g"),
      col(valueCol).cast("double").as("v"))
    val perGV = src.groupBy("g", "v").agg(count(lit(1)).as("n_gv"))
    val perValue = perGV.groupBy("v").agg(sum(col("n_gv")).as("n_v"))
    val ranked = valueAvgRanks(perValue, nBuckets)
      .select(col("v"), col("n_v"), col("avg_rank"))
    val perGroup = perGV.join(ranked, "v")
      .groupBy("g")
      .agg(sum(col("n_gv")).as("n_g"),
        sum(col("n_gv").cast("double") * col("avg_rank")).as("r_g"))
    val ties = ranked.agg(
      sum(col("n_v").cast("double") * col("n_v").cast("double")
        * col("n_v").cast("double") - col("n_v").cast("double"))
        .as("tie3"))
    perGroup
      .select(col("n_g"),
        round(col("r_g") * col("r_g") / col("n_g").cast("double"), 6)
          .cast(d386).as("__t"))
      .agg(count(lit(1)).as("k"), sum(col("n_g")).as("n"),
        sum(col("__t")).cast("double").as("rr"))
      .crossJoin(broadcast(ties))
      .select(col("k"), col("n"),
        round({
          val nD = col("n").cast("double")
          val h = (lit(12.0) / (nD * (nD + 1.0)) * col("rr")) -
            lit(3.0) * (nD + 1.0)
          h / (lit(1.0) - col("tie3") / (nD * nD * nD - nD))
        }, 6).as("h"))
  }

  /** Two-sample Kolmogorov–Smirnov statistic D = sup|F_A − F_B| —
    * the distribution-level "did this feed drift" gate, complementing
    * [[mannWhitney]]'s location test. Both ECDFs step only at DISTINCT
    * values, so the sup is attained at a value-level row: one groupBy
    * to (v, per-group counts), bucketed-prefix cumulatives (no global
    * window), and the comparison |cumA·n_b − cumB·n_a| runs in exact
    * LONG arithmetic — D's rational value is engine-exact, only the
    * final division is float (rounded 6).
    *
    * Returns one row: (n_a, n_b, d). */
  def ksTest(df: DataFrame, valueCol: String, groupCol: String,
      groupA: String, groupB: String, nBuckets: Int = 1024): DataFrame = {
    val v = col(valueCol).cast("double")
    val perValue = df
      .filter(col(groupCol).isin(groupA, groupB))
      .select(v.as("v"), (col(groupCol) === groupA).as("isA"))
      .groupBy("v").agg(
        sum(when(col("isA"), 1L).otherwise(0L)).as("na_v"),
        sum(when(col("isA"), 0L).otherwise(1L)).as("nb_v"))
    val bounds = perValue.agg(min(col("v")).as("__lo"),
      max(col("v")).as("__hi"))
    val withB = perValue.join(broadcast(bounds))
      .withColumn("__b",
        when(col("__hi") === col("__lo"), lit(0))
          .otherwise(least(lit(nBuckets - 1),
            floor((col("v") - col("__lo"))
              / (col("__hi") - col("__lo")) * nBuckets).cast("int"))))
      .drop("__lo", "__hi")
    val wGrid = Window.orderBy(col("__b").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefixes = withB.groupBy("__b")
      .agg(sum("na_v").as("__ba"), sum("nb_v").as("__bb"))
      .withColumn("__pa", coalesce(sum("__ba").over(wGrid), lit(0L)))
      .withColumn("__pb", coalesce(sum("__bb").over(wGrid), lit(0L)))
      .select(col("__b"), col("__pa"), col("__pb"))
    // cumulative INCLUDING the current value: ECDFs are right-continuous,
    // so the sup over the step functions is attained at some step point
    val wLocal = Window.partitionBy("__b").orderBy(col("v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = withB.join(broadcast(prefixes), "__b")
      .withColumn("cumA", col("__pa") + sum("na_v").over(wLocal))
      .withColumn("cumB", col("__pb") + sum("nb_v").over(wLocal))
    val totals = perValue.agg(sum("na_v").as("n_a"), sum("nb_v").as("n_b"))
    cum.join(broadcast(totals))
      .agg(max(abs(col("cumA") * col("n_b") - col("cumB") * col("n_a")))
        .as("__num"), max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"))
      .select(col("n_a"), col("n_b"),
        round(col("__num").cast("double")
          / (col("n_a").cast("double") * col("n_b").cast("double")), 6)
          .as("d"))
  }

  /** Two-sample Cramér–von Mises criterion T = (nm/N²)·Σ(F_A−F_B)²
    * over the pooled sample — the INTEGRAL distribution-distance
    * companion to [[ksTest]]'s sup (T sees diffuse drift a single
    * sup point misses). Same value-grid + bucketed-prefix machinery;
    * every numerator term l_v·(cumA·n_b − cumB·n_a)² is exact integer
    * arithmetic accumulated in DECIMAL(38,0) — T is engine-exact up
    * to ONE final rounded division (no float terms at all). Returns
    * one row (n_a, n_b, t). */
  def cramerVonMises(df: DataFrame, valueCol: String, groupCol: String,
      groupA: String, groupB: String, nBuckets: Int = 1024): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val v = col(valueCol).cast("double")
    val perValue = df
      .filter(col(groupCol).isin(groupA, groupB))
      .select(v.as("v"), (col(groupCol) === groupA).as("isA"))
      .groupBy("v").agg(
        sum(when(col("isA"), 1L).otherwise(0L)).as("na_v"),
        sum(when(col("isA"), 0L).otherwise(1L)).as("nb_v"))
    val bounds = perValue.agg(min(col("v")).as("__lo"),
      max(col("v")).as("__hi"))
    val withB = perValue.join(broadcast(bounds))
      .withColumn("__b",
        when(col("__hi") === col("__lo"), lit(0))
          .otherwise(least(lit(nBuckets - 1),
            floor((col("v") - col("__lo"))
              / (col("__hi") - col("__lo")) * nBuckets).cast("int"))))
      .drop("__lo", "__hi")
    val wGrid = Window.orderBy(col("__b").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefixes = withB.groupBy("__b")
      .agg(sum("na_v").as("__ba"), sum("nb_v").as("__bb"))
      .withColumn("__pa", coalesce(sum("__ba").over(wGrid), lit(0L)))
      .withColumn("__pb", coalesce(sum("__bb").over(wGrid), lit(0L)))
      .select(col("__b"), col("__pa"), col("__pb"))
    val wLocal = Window.partitionBy("__b").orderBy(col("v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = withB.join(broadcast(prefixes), "__b")
      .withColumn("cumA", col("__pa") + sum("na_v").over(wLocal))
      .withColumn("cumB", col("__pb") + sum("nb_v").over(wLocal))
    val totals = perValue.agg(sum("na_v").as("n_a"), sum("nb_v").as("n_b"))
    val d = cum.crossJoin(broadcast(totals))
      .select(col("n_a"), col("n_b"),
        ((col("na_v") + col("nb_v")).cast(DecimalType(38, 0))
          * (col("cumA") * col("n_b") - col("cumB") * col("n_a"))
          * (col("cumA") * col("n_b") - col("cumB") * col("n_a")))
          .as("__t"))
    d.groupBy("n_a", "n_b")
      .agg(sum(col("__t")).as("__num"))
      .select(col("n_a"), col("n_b"),
        round(col("__num").cast("double")
          / ((col("n_a").cast("double") + col("n_b").cast("double"))
            * (col("n_a").cast("double") + col("n_b").cast("double"))
            * col("n_a").cast("double") * col("n_b").cast("double")),
          6).as("t"))
  }

  /** Exact ROC-AUC with tie correction — the probability a random
    * positive outscores a random negative (ties count ½). Identity
    * AUC = (R⁺ − n⁺(n⁺+1)/2) / (n⁺·n⁻) where R⁺ is the positives'
    * rank sum under average-rank ties: all rank math runs on the
    * value-level grid ([[valueAvgRanks]] — bucketed prefix, no global
    * sort), and average ranks are exact binary halves, so the rank sum
    * is association-free across engines. One row: (n_pos, n_neg, auc). */
  def auc(df: DataFrame, scoreCol: String, labelCol: Column,
      nBuckets: Int = 1024): DataFrame = {
    val perValue = df
      .select(col(scoreCol).cast("double").as("v"), labelCol.as("isP"))
      .groupBy("v").agg(
        sum(when(col("isP"), 1L).otherwise(0L)).as("na_v"),
        count(lit(1)).as("n_v"))
    val ranked = valueAvgRanks(perValue, nBuckets)
    ranked.agg(
        sum(col("na_v")).as("n_pos"),
        sum(col("n_v") - col("na_v")).as("n_neg"),
        sum(col("na_v").cast("double") * col("avg_rank")).as("rp"))
      .select(col("n_pos"), col("n_neg"),
        round((col("rp") - col("n_pos").cast("double")
            * (col("n_pos").cast("double") + 1.0) / 2.0)
          / (col("n_pos").cast("double") * col("n_neg").cast("double")), 6)
          .as("auc"))
  }

  /** Gini coefficient of a non-negative quantity (revenue inequality,
    * token-budget concentration): G = 2·Σᵢ rᵢxᵢ / (n·Σx) − (n+1)/n
    * with ranks from [[globalRowNumber]] — the sorted-sum formula
    * WITHOUT the single-task global sort. rᵢxᵢ accumulates in DECIMAL
    * (rank is long, x is a 2-dp quantity), so the heavy sums are
    * engine-exact; the final ratio is one float expression (rounded 6).
    * Ties take distinct ranks, but Σ r x is tie-order-invariant because
    * tied values contribute (Σ ranks)·x either way. */
  def gini(df: DataFrame, valueCol: String, idCol: String,
      nBuckets: Int = 1024): DataFrame = {
    val ranked = globalRowNumber(
      df.select(col(idCol).as("__id"),
        col(valueCol).cast(org.apache.spark.sql.types.DecimalType(18, 4))
          .as("__x")),
      "__x", "__id", nBuckets)
    ranked.agg(
        count(lit(1)).cast("double").as("n"),
        sum(col("__x")).cast("double").as("sx"),
        sum(col("rank").cast(
          org.apache.spark.sql.types.DecimalType(18, 0)) * col("__x"))
          .cast("double").as("srx"))
      .select(col("n").cast("long").as("n"),
        round(lit(2.0) * col("srx") / (col("n") * col("sx"))
          - (col("n") + 1.0) / col("n"), 6).as("gini"))
  }

  /** Exact per-group discrete quantiles (percentile_disc: the value at
    * rank ⌈p·n⌉) WITHOUT a sort-based percentile aggregate — the
    * 100 TB-safe twin of `percentile()`, as distributed selection with
    * RECURSIVE bucket refinement:
    *
    *  1. one partial-agg scan to a per-(group, bucket) COUNT histogram
    *     (grid-sized: groups × ≤ nBuckets rows) with an exclusive
    *     prefix over the bucket grid (grid windows partition by group
    *     and order a ≤ nBuckets domain — never a corpus column); each
    *     requested p locates the unique bucket holding rank ⌈p·n⌉ and
    *     keeps only that slice (broadcast-pruned map-side);
    *  2. value-range bucketing CAN degenerate on skew — a heavy-tailed
    *     distribution puts nearly every row in the median's bucket —
    *     so any (group, p) slice still wider than `maxSlice` rows is
    *     re-bucketed on its ACTUAL min/max and re-located, repeatedly
    *     (≤ 6 levels; a slice whose range collapses to a single double
    *     IS the answer). Small slices finish with an in-slice
    *     row_number — a bounded, never corpus-sized sort.
    *
    * No corpus-sized shuffle anywhere: the histogram pass moves
    * ≤ partitions × nBuckets partial counts and each refinement only
    * ever rescans the (cached, shrinking) located slice. All selection
    * math is exact LONG/integer arithmetic; ps must be binary-exact
    * fractions (.25, .5, .75) so ⌈p·n⌉ agrees across engines. Equal
    * values always share a bucket, and in-slice row_number ties occur
    * only between EQUAL values, so the selected VALUE is deterministic
    * under any partitioning. NULL values are excluded (DuckDB
    * quantile_disc semantics).
    *
    * SCHEDULING: per refinement level the only user-blocking job is a
    * collect of the per-(group, p) slice STATE — grid-sized by design
    * (groups × ps rows, same bound as the result itself) and guarded
    * by `maxDriverGrid` with a fully-distributed fallback, so a
    * high-cardinality group column can never flood the driver. The
    * driver routes each (group, p) to its collapsed / small / refine
    * branch as broadcast LITERALS; everything else (the corpus scan,
    * histograms, located slices) sits behind LAZY localCheckpoints —
    * lazy so materialization fuses into the state collect instead of
    * paying one scheduled job each (6+ blocking jobs → 1 per level),
    * but still checkpoints so every downstream plan sees a LogicalRDD
    * leaf: with plain persists the nested union/window trees re-enter
    * Catalyst whole at every level and analysis time EXPLODES (a
    * measured 2-call composition spent ~40 s in the optimizer).
    *
    * Returns (groupCol, p, value) — one row per group × p. */
  def quantileDisc(df: DataFrame, groupCol: String, valueCol: String,
      ps: Seq[Double], nBuckets: Int = 1024,
      maxSlice: Long = 65536L, maxLevels: Int = 6,
      maxDriverGrid: Int = 65536): DataFrame = {
    require(ps.nonEmpty, "at least one quantile")
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    import scala.jdk.CollectionConverters._
    val g = col(groupCol)
    val spark = df.sparkSession

    def bucketCol(lo: Column, hi: Column, v: Column): Column =
      when(hi === lo, lit(0))
        .otherwise(greatest(lit(0), least(lit(nBuckets - 1),
          floor((v - lo) / (hi - lo) * nBuckets).cast("int"))))

    val raw = df.select(g.as("g"), col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
      .graftCheckpoint(false)
    val gType = raw.schema("g").dataType
    val bounds = raw.groupBy("g")
      .agg(min("v").as("lo"), max("v").as("hi"), count(lit(1)).as("n"))

    // ---- level 0: one histogram per GROUP (all ps share it) ----
    val wG = Window.partitionBy("g").orderBy(col("__b").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val hist0 = raw.join(broadcast(bounds), "g")
      .withColumn("__b", bucketCol(col("lo"), col("hi"), col("v")))
      .groupBy("g", "__b").agg(count(lit(1)).as("bn"))
      .withColumn("pre", coalesce(sum("bn").over(wG), lit(0L)))
    val targets = ps.map(p => struct(lit(p).as("p"),
      ceil(lit(p) * col("n").cast("double")).cast("long").as("tgt")))
    val loc0 = hist0
      .join(broadcast(bounds.select(col("g"), col("n"))), "g")
      .withColumn("__t", explode(array(targets: _*)))
      .filter(col("__t.tgt") > col("pre")
        && col("__t.tgt") <= col("pre") + col("bn"))
      .select(col("g"), col("__t.p").as("p"), col("__b"),
        (col("__t.tgt") - col("pre")).as("tgt"))
    // initial per-(group, p) slice: the located bucket's rows (ps
    // sharing a bucket just replicate that ~1/nBuckets slice)
    var slice = raw.join(broadcast(bounds), "g")
      .withColumn("__b", bucketCol(col("lo"), col("hi"), col("v")))
      .join(broadcast(loc0), Seq("g", "__b"))
      .select(col("g"), col("p"), col("v"), col("tgt"))
      .graftCheckpoint(false)

    val wSel = Window.partitionBy("g", "p").orderBy(col("v").asc)
    def finalize(s: DataFrame): DataFrame =
      s.withColumn("__rn", row_number().over(wSel))
        .filter(col("__rn") === col("tgt"))
        .select(col("g"), col("p"), col("v").as("value"))

    // literal-frame builders for the driver-routed state
    def gpFrame(rows: Seq[Row]): DataFrame = spark.createDataFrame(
      rows.asJava, StructType(Seq(StructField("g", gType),
        StructField("p", DoubleType, nullable = false))))

    var results = List.empty[DataFrame]
    var level = 0
    var exhausted = false
    while (level < maxLevels && !exhausted) {
      val st = slice.groupBy("g", "p")
        .agg(min("v").as("lo"), max("v").as("hi"),
          count(lit(1)).as("m"), max("tgt").as("tgt"))
      // the ONE blocking job this level: grid-sized slice state
      val stRows = st.limit(maxDriverGrid + 1).collect()
      if (stRows.length > maxDriverGrid) {
        // guard tripped (≥64k open (group, p) cells): finish with the
        // fully-distributed refinement — never flood the driver
        results :::= refineDistributed(slice, bucketCol, finalize,
          maxSlice, maxLevels - level)
        exhausted = true
      } else {
        // collapsed range: every remaining value is equal — the answer.
        // java.lang.Double.compare mirrors Spark SQL's `===` (NaN equals
        // NaN), unlike Scala's primitive ==
        def deq(a: Double, b: Double) = java.lang.Double.compare(a, b) == 0
        val collapsed = stRows.filter(r => deq(r.getDouble(2), r.getDouble(3)))
        if (collapsed.nonEmpty) results ::= spark.createDataFrame(
          collapsed.map(r => Row(r.get(0), r.getDouble(1), r.getDouble(2)))
            .toSeq.asJava,
          StructType(Seq(StructField("g", gType),
            StructField("p", DoubleType, nullable = false),
            StructField("value", DoubleType, nullable = false))))
        // small slice: exact in-slice rank (bounded sort)
        val small = stRows.filter(r =>
          !deq(r.getDouble(2), r.getDouble(3)) && r.getLong(4) <= maxSlice)
        if (small.nonEmpty) results ::= finalize(slice.join(
          broadcast(gpFrame(small.map(r => Row(r.get(0), r.getDouble(1)))
            .toSeq)), Seq("g", "p")))
        val big = stRows.filter(r =>
          !deq(r.getDouble(2), r.getDouble(3)) && r.getLong(4) > maxSlice)
        if (big.isEmpty) {
          exhausted = true
        } else {
          // skew refinement: re-bucket the oversized slices on their
          // ACTUAL bounds (driver literals) and re-locate the target
          val bigDf = broadcast(spark.createDataFrame(
            big.map(r => Row(r.get(0), r.getDouble(1), r.getDouble(2),
              r.getDouble(3), r.getLong(5))).toSeq.asJava,
            StructType(Seq(StructField("g", gType),
              StructField("p", DoubleType, nullable = false),
              StructField("lo", DoubleType, nullable = false),
              StructField("hi", DoubleType, nullable = false),
              StructField("tgt", LongType, nullable = false)))))
          val wGP = Window.partitionBy("g", "p").orderBy(col("__b").asc)
            .rowsBetween(Window.unboundedPreceding, -1)
          val bs = slice
            .join(bigDf.select(col("g"), col("p"), col("lo"), col("hi")),
              Seq("g", "p"))
            .withColumn("__b", bucketCol(col("lo"), col("hi"), col("v")))
            .select(col("g"), col("p"), col("v"), col("tgt"), col("__b"))
            .graftCheckpoint(false)
          val hist = bs.groupBy("g", "p", "__b").agg(count(lit(1)).as("bn"))
            .withColumn("pre", coalesce(sum("bn").over(wGP), lit(0L)))
          val loc = hist
            .join(bigDf.select(col("g"), col("p"), col("tgt")),
              Seq("g", "p"))
            .filter(col("tgt") > col("pre")
              && col("tgt") <= col("pre") + col("bn"))
            .select(col("g"), col("p"), col("__b"),
              (col("tgt") - col("pre")).as("__tgt2"))
          slice = bs.drop("tgt")
            .join(broadcast(loc), Seq("g", "p", "__b"))
            .select(col("g"), col("p"), col("v"), col("__tgt2").as("tgt"))
            .graftCheckpoint(false)
        }
      }
      level += 1
    }
    // pathological doubles can survive maxLevels of refinement: finish
    // whatever remains with the (correct, possibly large) sort
    if (!exhausted) results ::= finalize(slice)
    if (results.isEmpty) results ::= spark.createDataFrame(
      java.util.Collections.emptyList[Row](),
      StructType(Seq(StructField("g", gType),
        StructField("p", DoubleType, nullable = false),
        StructField("value", DoubleType, nullable = false))))
    results.reduce(_ unionAll _)
      .select(col("g").as(groupCol), col("p"), col("value"))
  }

  /** The fully-distributed refinement loop `quantileDisc` falls back
    * to when the open (group, p) grid outgrows the driver guard —
    * identical selection algebra, eager checkpoints per level (each
    * level's slice feeds several concurrently-materialized broadcast
    * branches). Returns the finished per-branch result frames. */
  private def refineDistributed(slice0: DataFrame,
      bucketCol: (Column, Column, Column) => Column,
      finalize: DataFrame => DataFrame,
      maxSlice: Long, maxLevels: Int): List[DataFrame] = {
    var slice = slice0
    var results = List.empty[DataFrame]
    var level = 0
    var exhausted = false
    while (level < maxLevels && !exhausted) {
      val st = slice.groupBy("g", "p")
        .agg(min("v").as("lo"), max("v").as("hi"),
          count(lit(1)).as("m"), max("tgt").as("tgt"))
        .graftCheckpoint(true) // grid-sized; consumed by 3 branches
      results ::= st.filter(col("hi") === col("lo"))
        .select(col("g"), col("p"), col("lo").as("value"))
      val small = st.filter(col("hi") =!= col("lo") && col("m") <= maxSlice)
        .select(col("g"), col("p"))
      results ::= finalize(slice.join(broadcast(small), Seq("g", "p")))
      val big = st.filter(col("hi") =!= col("lo") && col("m") > maxSlice)
      if (big.isEmpty) {
        exhausted = true
      } else {
        val wGP = Window.partitionBy("g", "p").orderBy(col("__b").asc)
          .rowsBetween(Window.unboundedPreceding, -1)
        val bs = slice
          .join(broadcast(big.select(col("g"), col("p"),
            col("lo"), col("hi"))), Seq("g", "p"))
          .withColumn("__b", bucketCol(col("lo"), col("hi"), col("v")))
          .select(col("g"), col("p"), col("v"), col("tgt"), col("__b"))
          .graftCheckpoint(true)
        val hist = bs.groupBy("g", "p", "__b").agg(count(lit(1)).as("bn"))
          .withColumn("pre", coalesce(sum("bn").over(wGP), lit(0L)))
        val loc = hist
          .join(broadcast(big.select(col("g"), col("p"), col("tgt"))),
            Seq("g", "p"))
          .filter(col("tgt") > col("pre")
            && col("tgt") <= col("pre") + col("bn"))
          .select(col("g"), col("p"), col("__b"),
            (col("tgt") - col("pre")).as("__tgt2"))
        slice = bs.drop("tgt")
          .join(broadcast(loc), Seq("g", "p", "__b"))
          .select(col("g"), col("p"), col("v"), col("__tgt2").as("tgt"))
          .graftCheckpoint(true)
      }
      level += 1
    }
    if (!exhausted) results ::= finalize(slice)
    results
  }

  /** Average precision (area under the precision–recall curve by the
    * step rule) for a STRICT deterministic ranking — score desc, id
    * asc (ties resolved by id, the reproducible convention; AUC q222
    * owns the tie-averaged view). AP = (1/P) Σ_{positives} cumPos/rank.
    * Both the global rank and the cumulative-positive prefix use the
    * bucketed machinery — no corpus-wide window; per-positive
    * precision terms round to 9 dp and DECIMAL-sum. Returns one row
    * (n, n_pos, ap). */
  def averagePrecision(df: DataFrame, scoreCol: String, idCol: String,
      isPos: org.apache.spark.sql.Column, nBuckets: Int = 1024)
      : DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val ranked = globalRowNumber(
      df.select((-col(scoreCol).cast("double")).as("__negs"),
        col(idCol).as("__id"), isPos.as("__y")),
      "__negs", "__id", nBuckets)
    // ADAPTIVE rank blocks: block length ⌈N/1024⌉ keeps the block
    // GRID ≤ 1024 rows at ANY corpus size (a fixed 64-row block would
    // put an N/64-row prefix window on one task at 100 TB)
    val nTot = broadcast(ranked.agg(count(lit(1)).as("__N")))
    val withRb = ranked.crossJoin(nTot)
      .withColumn("__rb", ((col("rank") - 1L) /
        greatest(lit(1L), expr("(__N + 1023) div 1024"))).cast("long"))
    val wGrid = Window.orderBy(col("__rb").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val pre = withRb.groupBy("__rb")
      .agg(sum(when(col("__y"), 1L).otherwise(0L)).as("__pn"))
      .withColumn("__pp", coalesce(sum("__pn").over(wGrid), lit(0L)))
      .select(col("__rb"), col("__pp"))
    val wLocal = Window.partitionBy("__rb").orderBy(col("rank").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withRb.join(broadcast(pre), "__rb")
      .withColumn("__cum", col("__pp")
        + sum(when(col("__y"), 1L).otherwise(0L)).over(wLocal))
      .select(col("__y"),
        when(col("__y"), round(col("__cum").cast("double")
          / col("rank").cast("double"), 9).cast(DecimalType(28, 9)))
          .as("__t"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__y"), 1L).otherwise(0L)).as("n_pos"),
        sum(col("__t")).cast("double").as("__s"))
      .select(col("n"), col("n_pos"),
        round(col("__s") / col("n_pos").cast("double"), 6).as("ap"))
  }

  /** Winsorized mean per group — the robust metric that tames heavy
    * tails without dropping rows: values clamp to the [pLo, pHi]
    * discrete quantiles (from [[quantileDisc]]'s no-global-sort grid
    * machinery) before averaging. Clamped values are existing data
    * values, so for fixed-dp inputs the winsorized sum stays
    * decimal-exact like the raw one. Two scans: one for thresholds,
    * one for the clamped aggregate (thresholds broadcast). Returns
    * (groupCol, n, lo, hi, mean_raw, mean_winsor). */
  def winsorizedMean(df: DataFrame, groupCol: String, valueCol: String,
      pLo: Double, pHi: Double): DataFrame = {
    require(pLo > 0.0 && pHi < 1.0 && pLo < pHi)
    val d184 = org.apache.spark.sql.types.DecimalType(18, 4)
    val th = quantileDisc(df, groupCol, valueCol, Seq(pLo, pHi))
      .groupBy(groupCol)
      .agg(max(when(col("p") === pLo, col("value"))).as("lo"),
        max(when(col("p") === pHi, col("value"))).as("hi"))
    df.select(col(groupCol), col(valueCol).cast("double").as("__v"))
      .join(broadcast(th), groupCol)
      .groupBy(groupCol, "lo", "hi")
      .agg(count(lit(1)).as("n"),
        sum(col("__v").cast(d184)).as("__sr"),
        sum(greatest(least(col("__v"), col("hi")), col("lo")).cast(d184))
          .as("__sw"))
      .select(col(groupCol), col("n"), col("lo"), col("hi"),
        round(col("__sr").cast("double") / col("n").cast("double"), 6)
          .as("mean_raw"),
        round(col("__sw").cast("double") / col("n").cast("double"), 6)
          .as("mean_winsor"))
  }

  /** Friedman test (1937) — the k-treatment REPEATED-MEASURES rank
    * test beside [[kruskalWallis]]'s independent-groups one: each
    * block ranks its k treatment values 1..k (ties get the average
    * rank), and Q = 12/(n·k·(k+1)) · Σ_j R_j² − 3·n·(k+1) asks whether
    * any treatment consistently out-ranks the others across blocks.
    *
    * Input is the CELL relation (blockCol, treatmentCol, valueCol) —
    * one value per block × treatment, integer-comparable (LONG).
    * Blocks missing any treatment are dropped (the test needs complete
    * blocks). All algebra is integer-exact: doubled average ranks
    * r2 = 2·#less + #eq + 1 come from a window PARTITIONED by block
    * (k rows per partition — never a corpus-wide window), rank sums
    * R2_j = Σ r2 are BIGINTs, and since Σ_j R_j is the constant
    * n·k·(k+1)/2 even under ties, Q ≥ 0 exactly, so the final value is
    * one unsigned integer-micro rounding of
    * (3·ΣR2² − 3·n²·k·(k+1)²) / (n·k·(k+1)) — engine-exact, no
    * double summation order anywhere. Ties are NOT variance-corrected
    * (the classic statistic); heavy ties make Q conservative.
    * Returns one row (k, n_blocks, q_stat). */
  def friedman(cells: DataFrame, blockCol: String, treatmentCol: String,
      valueCol: String): DataFrame = {
    val src = cells.select(col(blockCol).as("b"),
      col(treatmentCol).as("t"), col(valueCol).cast("long").as("v"))
    val kRow = broadcast(src.agg(
      countDistinct(col("t")).as("kk")))
    val complete = src
      .join(broadcast(src.groupBy("b").agg(count(lit(1)).as("nt"))
        .crossJoin(kRow).filter(col("nt") === col("kk")).select("b")),
        "b")
    val wB = Window.partitionBy("b").orderBy("v")
    val wBV = Window.partitionBy("b", "v")
    val r2 = complete
      .withColumn("r2", lit(2) * rank().over(wB)
        + count(lit(1)).over(wBV) - lit(1))
    val perT = r2.groupBy("t")
      .agg(sum(col("r2")).cast("long").as("rs2"),
        count(lit(1)).as("n"))
    perT.agg(count(lit(1)).as("k"), max(col("n")).as("n_blocks"),
        sum(col("rs2").cast("decimal(38,0)") * col("rs2")).as("ss"))
      .select(col("k"), col("n_blocks"),
        // num = 3·ΣR2² − 3·n²·k·(k+1)²; den = n·k·(k+1); Q = num/den ≥ 0
        when(col("k") === 0 || col("n_blocks").isNull,
          lit(null).cast("double"))
          .otherwise(
            expr("""(2 * (3 * ss - 3 * n_blocks * n_blocks * k
                          * (k + 1) * (k + 1)) * 1000000
                   + n_blocks * k * (k + 1))
                  DIV (2 * n_blocks * k * (k + 1))""")
              .cast("double") / 1e6).as("q_stat"))
  }

  /** Page's trend test (Page 1963) — [[friedman]]'s ORDERED
    * alternative: does the response rise monotonically along a
    * hypothesized treatment ordering (here: the treatments sorted
    * ascending — map treatment labels beforehand to encode any other
    * hypothesis)? L = Σ_j c_j·R_j with c_j the hypothesized position,
    * standardized under H0 by μ_L = n·k(k+1)²/4 and
    * σ²_L = n·k²(k+1)²(k−1)/144 (no tie correction — the classic
    * statistic; ties make |z| conservative).
    *
    * Same cell-relation input and complete-block discipline as
    * [[friedman]]; the same doubled average ranks keep every sum
    * integer: l2_stat = 2L is a BIGINT and the z numerator
    * 2·(L2 − μ2) = 2·L2 − n·k(k+1)² is exact. The one float step is
    * the final z division + sqrt, identical token-for-token in both
    * engines, with `+ 0.0` normalizing a −0.0 away (a z that rounds
    * to the zero boundary must hash identically — the q201 lesson).
    * Returns one row (k, n_blocks, l2_stat, z). */
  def pageTrend(cells: DataFrame, blockCol: String,
      treatmentCol: String, valueCol: String): DataFrame = {
    val src = cells.select(col(blockCol).as("b"),
      col(treatmentCol).as("t"), col(valueCol).cast("long").as("v"))
    val kRow = broadcast(src.agg(countDistinct(col("t")).as("kk")))
    val complete = src
      .join(broadcast(src.groupBy("b").agg(count(lit(1)).as("nt"))
        .crossJoin(kRow).filter(col("nt") === col("kk")).select("b")),
        "b")
    val wB = Window.partitionBy("b").orderBy("v")
    val wBV = Window.partitionBy("b", "v")
    val r2 = complete
      .withColumn("r2", lit(2) * rank().over(wB)
        + count(lit(1)).over(wBV) - lit(1))
    val perT = r2.groupBy("t")
      .agg(sum(col("r2")).cast("long").as("rs2"),
        count(lit(1)).as("n"))
      // hypothesized position: the k-row aggregate frame is metadata-
      // scale, so the unpartitioned ordering window is bounded
      .withColumn("cj", row_number().over(Window.orderBy("t")))
    perT.agg(count(lit(1)).as("k"), max(col("n")).as("n_blocks"),
        sum(col("cj") * col("rs2")).cast("long").as("l2"))
      .select(col("k"), col("n_blocks"), col("l2").as("l2_stat"),
        when(col("k") < 2 || col("n_blocks").isNull
            || col("n_blocks") === 0, lit(null).cast("double"))
          .otherwise(round(
            (lit(2) * col("l2")
              - expr("n_blocks * k * (k + 1) * (k + 1)"))
              .cast("double") * 3.0
              / (expr("k * (k + 1)").cast("double")
                * sqrt(expr("n_blocks * (k - 1)").cast("double"))), 6)
            + lit(0.0)).as("z"))
  }

  /** Jonckheere–Terpstra test (1954) — [[kruskalWallis]]'s ORDERED
    * alternative, completing the rank-test matrix (unordered/ordered ×
    * independent/paired = KW / JT / Friedman / Page): does the value
    * distribution shift upward along the ordinal GROUP order (groups
    * sorted ascending by their key)? The statistic is the sum of
    * pairwise Mann–Whitney counts over ordered group pairs,
    * U = Σ_{g<h} [#(x_g < x_h) + ½·#(x_g = x_h)], standardized under
    * H0 by μ = (N² − Σn_g²)/4 and the NO-TIE variance
    * σ² = [N²(2N+3) − Σn_g²(2n_g+3)]/72 (the classic form; heavy ties
    * make |z| conservative).
    *
    * Scale shape: the corpus reduces to the (group, value) count grid;
    * per-group counts-below come from [[valueAvgRanks]]-style bucketed
    * prefixes PARTITIONED by group (never a corpus-wide window), the
    * dense pooled grid is |distinct values| × k rows, and the ordered
    * pair sum is a per-value k²-cell combination — exact BIGINT
    * throughout, with doubled counts (U2 = 2U) keeping ½-ties integer.
    * The one float step (z) is token-identical in both engines and
    * +0.0-normalized. Returns one row (k, n, u2_stat, z). */
  def jonckheereTerpstra(df: DataFrame, groupCol: String,
      valueCol: String, nBuckets: Int = 1024): DataFrame = {
    val src = df.select(col(groupCol).as("g"),
      col(valueCol).cast("double").as("v"))
    val cells = src.groupBy("g", "v").agg(count(lit(1)).as("c"))
      .graftCheckpoint(false) // grid + group-index + pooled consumers
    // ordinal group index: the group frame is metadata-scale (k rows),
    // so the unpartitioned ordering window is bounded
    val gIdx = broadcast(cells.groupBy("g")
      .agg(sum(col("c")).as("ng"))
      .withColumn("gi", row_number().over(Window.orderBy("g"))))
    // dense pooled grid: every (value, group) cell incl. zeros, so the
    // per-group cumulative is defined at every pooled value
    val pooled = cells.select("v").distinct()
    val grid = pooled.crossJoin(gIdx.select("g", "gi"))
      .join(cells, Seq("g", "v"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
    // per-group counts STRICTLY BELOW each pooled value: bucketed
    // prefix partitioned by (g, bucket) — the valueAvgRanks shape
    val bounds = pooled.agg(min(col("v")).as("__lo"),
      max(col("v")).as("__hi"))
    val withB = grid.join(broadcast(bounds))
      .withColumn("__b",
        when(col("__hi") === col("__lo"), lit(0))
          .otherwise(least(lit(nBuckets - 1),
            floor((col("v") - col("__lo"))
              / (col("__hi") - col("__lo")) * nBuckets).cast("int"))))
      .drop("__lo", "__hi")
    val wGrid = Window.partitionBy("g").orderBy(col("__b").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefixes = withB.groupBy("g", "__b")
      .agg(sum(col("c")).as("__bn"))
      .withColumn("__pre", coalesce(sum("__bn").over(wGrid), lit(0L)))
      .select(col("g"), col("__b"), col("__pre"))
    val wLocal = Window.partitionBy("g", "__b").orderBy(col("v").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val below = withB.join(prefixes, Seq("g", "__b"))
      .withColumn("below",
        col("__pre") + coalesce(sum(col("c")).over(wLocal), lit(0L)))
      .select(col("gi"), col("v"), col("below"))
    // U2 contribution at value v for ordered pair (g < h): each pair
    // (x ∈ g, y ∈ h) with y = v contributes 2·[x < v] + [x = v], i.e.
    // 2·c_h(v)·below_g(v) + c_g(v)·c_h(v). Dense rows with c_h(v) = 0
    // contribute NOTHING, so the h side is the REAL cell relation
    // (corpus-sparse), not the dense grid — the ordered-pair join
    // output shrinks k-fold (round-14: the dense⋈dense self-join
    // emitted |pooled|·k(k−1)/2 rows; real⋈dense emits |cells|·(k−1)).
    // Split exactly: term1 = 2·c_h·below_g (real h × dense g),
    // term2 = c_g·c_h (real × real) — integer sums, order-free.
    val hCells = cells.join(gIdx.select("g", "gi"), "g")
      .select(col("gi").as("hIdx"), col("v"), col("c").as("ch"))
    val term1 = hCells
      .join(below.select(col("gi").as("gIdx"), col("v"),
        col("below").as("belowg")), Seq("v"))
      .filter(col("gIdx") < col("hIdx"))
      .agg(coalesce(sum(lit(2) * col("ch") * col("belowg")), lit(0L))
        .as("t1"))
    val term2 = hCells
      .join(hCells.select(col("hIdx").as("gIdx"), col("v"),
        col("ch").as("cg")), Seq("v"))
      .filter(col("gIdx") < col("hIdx"))
      .agg(coalesce(sum(col("cg") * col("ch")), lit(0L)).as("t2"))
    val u2fixed = term1.crossJoin(broadcast(term2))
      .select((col("t1") + col("t2")).as("u2"))
    // decimal moments: Σn²(2n+3) outgrows a long around 10⁹ rows
    val moms = broadcast(gIdx.agg(count(lit(1)).as("k"),
      sum(col("ng")).cast("decimal(38,0)").as("n"),
      sum(col("ng").cast("decimal(38,0)") * col("ng")).as("sn2"),
      sum(col("ng").cast("decimal(38,0)") * col("ng")
        * (lit(2) * col("ng") + lit(3))).as("sn23")))
    u2fixed.crossJoin(moms)
      .select(col("k"), col("n").cast("long").as("n"),
        col("u2").as("u2_stat"),
        when(col("k") < 2 || expr(
            "n * n * (2 * n + 3) - sn23") === 0,
          lit(null).cast("double"))
          .otherwise(round(
            (lit(2) * col("u2") - (col("n") * col("n") - col("sn2")))
              .cast("double") * 3.0
              / sqrt(expr("""2 * (n * n * (2 * n + 3) - sn23)""")
                .cast("double")), 6) + lit(0.0)).as("z"))
  }
}
