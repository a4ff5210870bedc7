package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import org.apache.spark.sql.graftext.BloomExprs

/** Bloom-filter join pruning: build a bloom filter over the small side's
  * join key, broadcast it, and drop big-side rows that cannot match
  * BEFORE the join shuffle. False positives are removed by the exact
  * join that follows, so results are exact — the bloom only cuts
  * shuffle volume (the dominant cost of a 100 TB join whose selective
  * side is too big to broadcast as a hash relation but whose *bloom* —
  * a few MB for 10^8 keys — always fits).
  *
  * Spark's optimizer plants the same filter pair itself
  * (`InjectRuntimeFilter`) when heuristics allow; this operator is the
  * explicit form for pipeline authors, usable across any frame boundary
  * (e.g. a pre-joined/pre-aggregated build side the optimizer can't see
  * through).
  */
object BloomPrune {

  /** Exact left-semi join of `big` against `small`, bloom-pruned.
    * `expectedItems` sizes the filter (Spark defaults 1M items / 8M bits;
    * size it to the build side's distinct-key count at scale). */
  def semiJoin(big: DataFrame, bigKey: String, small: DataFrame,
      smallKey: String, expectedItems: Long = 1000000L): DataFrame = {
    // might_contain requires the bloom binary as a scalar subquery (or
    // literal) — same shape InjectRuntimeFilter plants
    val bloom = small.agg(
      BloomExprs.bloomAgg(col(smallKey), expectedItems).as("bloom")).scalar()
    val pruned = big.filter(BloomExprs.mightContain(bloom, col(bigKey)))
    pruned.join(small.select(col(smallKey).as(bigKey)).distinct(),
      Seq(bigKey), "left_semi")
  }
}
