package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Engine-reproducible sketches. Spark's `approx_count_distinct` (HLL++)
  * is the production choice at 100 TB, but its estimate is
  * implementation-specific — no cross-engine oracle can check it. KMV
  * (k-minimum-values) over the md5 hash space is deterministic on ANY
  * engine: the k smallest 60-bit hashes of the distinct values determine
  * the estimate `(k-1) * 2^60 / h_k` exactly.
  */
object Sketches {

  val HashSpace: Double = math.pow(2.0, 60) // md5Long range [0, 2^60)

  /** Per-group KMV distinct-count estimate — single pass, no distinct
    * shuffle, no windows: a [[org.apache.spark.sql.graftext.KmvSketchAgg]]
    * TypedImperativeAggregate keeps a bounded k-element hash set per
    * group on the map side; only k longs per group cross the wire.
    * Returns (groupCol, est_distinct); groups with fewer than k distinct
    * values report the exact count. Bit-identical to [[kmvDistinctDf]]
    * (SketchesSpec proves it). */
  def kmvDistinct(df: DataFrame, groupCol: String, valueCol: String,
      k: Int): DataFrame =
    df.groupBy(groupCol)
      .agg(round(org.apache.spark.sql.graftext.KmvSketchAgg.kmvDistinct(
        col(valueCol).cast("string"), k), 4).as("est_distinct"))

  /** Per-group heavy hitters — single pass, no per-term groupBy shuffle:
    * a Space-Saving [[org.apache.spark.sql.graftext.TopKFreqAgg]] keeps a
    * `capacity`-bounded (term, count) map per group on the map side; at
    * most `capacity` entries per group cross the wire. Exact top-`topN`
    * whenever `capacity >=` the group's distinct cardinality (the regime
    * the oracle checks); bounded over-estimates under adversarial skew.
    * Returns (groupCol, term, cnt) rows, (cnt DESC, term ASC) within each
    * group. */
  def topKFrequent(df: DataFrame, groupCol: String, valueCol: String,
      capacity: Int, topN: Int): DataFrame =
    df.groupBy(groupCol)
      .agg(org.apache.spark.sql.graftext.TopKFreqAgg.topKFreq(
        col(valueCol).cast("string"), capacity, topN).as("__top"))
      .select(col(groupCol), explode(col("__top")).as("__e"))
      .select(col(groupCol), col("__e.term").as("term"), col("__e.cnt").as("cnt"))

  /** DF-algebra formulation of [[kmvDistinct]] (distinct → per-group
    * top-k by hash → max) — kept as the cross-check reference for the
    * native aggregate; the native form is the production path. */
  def kmvDistinctDf(df: DataFrame, groupCol: String, valueCol: String,
      k: Int): DataFrame = {
    val hashed = df.select(col(groupCol),
      TextFunctions.md5Long(col(valueCol).cast("string")).as("__h"))
      .distinct()
    // two-phase top-k: a single window per group would sort the whole
    // group's hash set on one task; salting first keeps every sort small
    // (≤ |group|/32), then the global pass ranks ≤ 32*k survivors.
    val wLocal = Window.partitionBy(col(groupCol), pmod(col("__h"), lit(32L)))
      .orderBy(col("__h").asc)
    val local = hashed.withColumn("__rl", row_number().over(wLocal))
      .filter(col("__rl") <= k).drop("__rl")
    val w = Window.partitionBy(groupCol).orderBy(col("__h").asc)
    local.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .groupBy(groupCol)
      .agg(max(col("__h")).as("__hk"), count(lit(1)).as("__k"))
      .select(col(groupCol),
        round(when(col("__k") < k, col("__k").cast("double"))
          .otherwise((col("__k") - 1).cast("double") * HashSpace /
            col("__hk").cast("double")), 4).as("est_distinct"))
  }

  /** KMV sketch as a PERSISTABLE row relation: the k smallest 60-bit
    * hashes of `valueCol`'s distinct values, one row each. The
    * [[kmvDistinctDf]] two-phase top-k (salted local pass, then a global
    * pass over ≤ 32·k survivors) keeps every sort small. Feed pairs of
    * these into [[kmvSetOps]] — the sketch, not the data, answers
    * union/intersection questions later. */
  def kmvMinHashes(df: DataFrame, valueCol: String, k: Int): DataFrame = {
    val hashed = df
      .select(TextFunctions.md5Long(col(valueCol).cast("string")).as("h"))
      .distinct()
    val wLocal = Window.partitionBy(pmod(col("h"), lit(32L)))
      .orderBy(col("h").asc)
    val local = hashed.withColumn("__rl", row_number().over(wLocal))
      .filter(col("__rl") <= k).drop("__rl")
    val w = Window.partitionBy(lit(0)).orderBy(col("h").asc)
    local.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k).drop("__rn")
  }

  /** Distinct-count estimate from a [[kmvMinHashes]] relation: exact
    * below saturation, `(k-1)·2^60 / h_k` at it. One output row
    * (`est` double, 4 dp). */
  private def kmvEstimate(sketch: DataFrame, k: Int, name: String): DataFrame =
    sketch.agg(max(col("h")).as("__hk"), count(lit(1)).as("__k"))
      .select(round(when(col("__k") < k, col("__k").cast("double"))
        .otherwise((col("__k") - 1).cast("double") * HashSpace /
          col("__hk").cast("double")), 4).as(name))

  /** Set operations from two KMV sketch relations (columns `h`): the
    * union sketch is the k smallest of the merged hash sets (a KMV
    * sketch of A ∪ B — the closure property), the Jaccard estimate is
    * the fraction of union-sketch members present in BOTH input
    * sketches (Beyer et al., SIGMOD'07), and the intersection estimate
    * is J · |A ∪ B|. Everything here runs on ≤ 2k-row frames — the
    * corpus was only touched when the sketches were built. Derived
    * numbers compose from the ROUNDED legs so both engines multiply
    * identical doubles. */
  def kmvSetOps(a: DataFrame, b: DataFrame, k: Int): DataFrame = {
    val union = a.select("h").union(b.select("h")).distinct()
      .orderBy(col("h").asc).limit(k)
    val inBoth = union
      .join(a.select(col("h").as("ha")), col("h") === col("ha"), "left_semi")
      .join(b.select(col("h").as("hb")), col("h") === col("hb"), "left_semi")
    val jac = union.agg(count(lit(1)).as("__ku"))
      .crossJoin(inBoth.agg(count(lit(1)).as("__kb")))
      // both sketches empty → J is 0/0: null (DuckDB float-division
      // semantics), not an ANSI error
      .select(when(col("__ku") === 0, lit(null).cast("double"))
        .otherwise(round(col("__kb").cast("double") /
          col("__ku").cast("double"), 6)).as("jaccard"))
    kmvEstimate(a, k, "est_a")
      .crossJoin(kmvEstimate(b, k, "est_b"))
      .crossJoin(kmvEstimate(union, k, "est_union"))
      .crossJoin(jac)
      .withColumn("est_intersect",
        round(col("jaccard") * col("est_union"), 4))
  }

  // ---- HyperLogLog ------------------------------------------------------

  /** Per-group HLL distinct-count estimate via the native single-pass
    * aggregate ([[org.apache.spark.sql.graftext.HllSketchAgg]]): 64-byte
    * register buffers, elementwise-max merge — the bounded-state
    * cardinality primitive for 100 TB groupBys. Returns
    * (groupCol, hll_est). Bit-identical to [[hllDistinctDf]]
    * (SketchesSpec proves it). */
  def hllDistinct(df: DataFrame, groupCol: String, valueCol: String): DataFrame =
    df.groupBy(groupCol)
      .agg(round(org.apache.spark.sql.graftext.HllSketchAgg.hllDistinct(
        col(valueCol).cast("string")), 4).as("hll_est"))

  /** Register-TABLE form of the HLL sketch: (groupCol, bucket, rho),
    * ≤ 64 rows per group — the PERSISTABLE sketch. At 100 TB the rollup
    * pattern is: sketch each day/partition into a register table, store
    * it, and answer "distinct over any union of days" by merging
    * registers with [[hllFromRegisters]] — no rescan of the data, ever.
    * `bin()` gives the minimal binary string on both engines, so
    * `rho = 55 - length(bin(w))` is pure integer algebra. */
  def hllRegisters(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    import org.apache.spark.sql.graftext.HllSketchAgg.{M, MaxRho}
    df.select(col(groupCol),
        TextFunctions.md5Long(col(valueCol).cast("string")).as("__h"))
      .select(col(groupCol), (col("__h") % M).as("bucket"),
        when(shiftright(col("__h"), 6) === 0, lit(MaxRho))
          .otherwise(lit(MaxRho) - length(bin(shiftright(col("__h"), 6))))
          .as("rho"))
      .groupBy(groupCol, "bucket").agg(max("rho").as("rho"))
  }

  /** Merge any union of [[hllRegisters]] tables (elementwise max over
    * (group, bucket)) and estimate — integer harmonic sum, same formula
    * as the native aggregate, so merged-estimate ≡ direct-estimate
    * bit-for-bit (SketchesSpec and q143's oracle both prove it). */
  def hllFromRegisters(regs: DataFrame, groupCol: String): DataFrame = {
    import org.apache.spark.sql.graftext.HllSketchAgg.{Alpha, M, MaxRho}
    val est = regs.groupBy(groupCol, "bucket").agg(max("rho").as("rho"))
      .groupBy(groupCol)
      .agg((sum(expr(s"shiftleft(CAST(1 AS BIGINT), $MaxRho - rho)")) +
        (lit(M) - count(lit(1))) * (1L << MaxRho)).as("__sumint"),
        (lit(M) - count(lit(1))).as("__zeros"))
      .select(col(groupCol), col("__zeros"),
        (lit(Alpha) * M * M * math.pow(2.0, MaxRho.toDouble) /
          col("__sumint").cast("double")).as("__raw"))
    est.select(col(groupCol),
      round(when(col("__raw") <= 2.5 * M && col("__zeros") > 0,
        lit(M.toDouble) * log(lit(M.toDouble) / col("__zeros")))
        .otherwise(col("__raw")), 4).as("hll_est"))
  }

  /** DF-algebra formulation of [[hllDistinct]] — registers as rows,
    * then merge+estimate. Kept as the cross-check reference AND as the
    * documentation of the exact cross-engine algorithm the DuckDB oracle
    * mirrors. */
  def hllDistinctDf(df: DataFrame, groupCol: String, valueCol: String): DataFrame =
    hllFromRegisters(hllRegisters(df, groupCol, valueCol), groupCol)

  // ---- Count-Min sketch -------------------------------------------------

  /** Count-Min sketch of the frequency of `valueCol`: `d` hash rows ×
    * `w` counters. The sketch RELATION is d·w rows total — bounded by
    * the configuration, not the data — built with one partial-agg
    * groupBy over the occurrence stream (no distinct, no windows). Point
    * queries then cost a broadcast join against it. Estimates
    * over-count only (min over d counters ≥ true count), and the whole
    * construction is md5-deterministic, so the DuckDB oracle reproduces
    * every counter exactly. */
  def cmsCells(df: DataFrame, valueCol: String, d: Int, w: Int): DataFrame =
    df.select(explode(sequence(lit(0), lit(d - 1))).as("r"),
        col(valueCol).cast("string").as("__v"))
      .select(col("r"), pmod(TextFunctions.md5Long(
        concat(col("r").cast("string"), lit(":"), col("__v"))), lit(w.toLong))
        .cast("int").as("c"))
      .groupBy("r", "c").agg(count(lit(1)).as("n"))

  /** Estimated frequency of each probe value against a [[cmsCells]]
    * sketch: min over the d matching counters (0 if a counter row is
    * absent). `probes` must have a string column `probe`. */
  def cmsEstimate(cells: DataFrame, probes: DataFrame, d: Int, w: Int): DataFrame =
    probes
      .select(col("probe"), explode(sequence(lit(0), lit(d - 1))).as("r"))
      .select(col("probe"), col("r"), pmod(TextFunctions.md5Long(
        concat(col("r").cast("string"), lit(":"), col("probe"))), lit(w.toLong))
        .cast("int").as("c"))
      .join(cells, Seq("r", "c"), "left")
      .groupBy("probe")
      .agg(min(coalesce(col("n"), lit(0L))).cast("long").as("cms_est"))
}
