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
}
