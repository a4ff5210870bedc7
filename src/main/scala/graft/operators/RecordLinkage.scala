package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Record linkage / entity resolution (the Fellegi-Sunter / Splink
  * shape): candidate pairs via BLOCKING, pairwise field-similarity
  * scoring, threshold, transitive closure into entities, and a
  * survivorship pass that elects one golden record per entity.
  *
  * Scale design (100 TB): candidate generation groups on the blocking
  * key — pair cost is Σ|block|², never |corpus|², so the blocking key
  * IS the scale knob (standard ER practice). Oversized,
  * non-discriminative blocks are dropped by the `maxBlockSize`
  * bounded-collect cap, the same hot-key discipline as the dedup
  * family. Clustering reuses [[Dedup.nearDupClusters]] (pregel-shape
  * label propagation); survivorship is one partial-agg-friendly groupBy
  * over the clustered records. */
object RecordLinkage {

  /** Candidate pairs within blocks, verified by Levenshtein distance on
    * `nameCol` ≤ `maxEdit` and scored: 0.7·name similarity (1 − dist /
    * max-len) + 0.3·numeric proximity (1 / (1 + |Δvalue|)). Returns
    * (a, b, edit_dist, score) with a < b, score ≥ minScore.
    *
    * Pair generation is the repo's in-group-combination shape (groupBy
    * block + memory-bounded collect + native pair explode), NOT a
    * self-join: the input relation is scanned ONCE and only (block,
    * id, name, value) rows shuffle; `maxBlockSize` doubles as the
    * hot-key cap (a block larger than the cap is non-discriminative —
    * dropping it is standard ER practice, and what the cap-exceeded
    * collect signals with null). */
  def linkPairs(recs: DataFrame, idCol: String, nameCol: String,
      blockKey: Column, valueCol: String, maxEdit: Int,
      minScore: Double, maxBlockSize: Int = 10000): DataFrame = {
    val base = recs.select(col(idCol).as("id"), col(nameCol).as("nm"),
      col(valueCol).cast("double").as("v"), blockKey.as("blk"))
    val grouped = base.groupBy("blk")
      .agg(sort_array(org.apache.spark.sql.graftext.BoundedCollectAgg
        .boundedCollectList(struct(col("id"), col("nm"), col("v")),
          maxBlockSize)).as("xs"))
      .filter(col("xs").isNotNull && size(col("xs")) >= 2)
    grouped
      .select(explode(org.apache.spark.sql.graftext.PairsAscExpr
        .pairsAsc(col("xs"))).as("p"))
      .select(col("p._1.id").as("a"), col("p._1.nm").as("nm_a"),
        col("p._1.v").as("v_a"), col("p._2.id").as("b"),
        col("p._2.nm").as("nm_b"), col("p._2.v").as("v_b"))
      // banded threshold form (Ukkonen): O(len·maxEdit) per pair with
      // early exit, vs O(len²) for the unbounded DP — the verify step is
      // the hot loop of the whole operator. Returns -1 past the bound.
      .withColumn("edit_dist",
        levenshtein(col("nm_a"), col("nm_b"), maxEdit).cast("long"))
      .filter(col("edit_dist") >= 0 && col("edit_dist") <= maxEdit)
      .withColumn("score", round(
        lit(0.7) * (lit(1.0) - col("edit_dist").cast("double") /
          greatest(length(col("nm_a")), length(col("nm_b")))
            .cast("double")) +
        lit(0.3) / (lit(1.0) + abs(col("v_a") - col("v_b"))), 6))
      .filter(col("score") >= minScore)
      .select("a", "b", "edit_dist", "score")
  }

  /** Entities + survivorship: transitive closure over the accepted
    * pairs, then one golden record per multi-member entity — canonical
    * id (min member), member count, the value-field survivor (max) and
    * sum. Singletons are already golden; they are excluded here. */
  def goldenRecords(recs: DataFrame, idCol: String, nameCol: String,
      blockKey: Column, valueCol: String, maxEdit: Int,
      minScore: Double, maxBlockSize: Int = 10000): DataFrame = {
    val pairs = linkPairs(recs, idCol, nameCol, blockKey, valueCol,
      maxEdit, minScore, maxBlockSize)
    val clusters = Dedup.nearDupClusters(recs, idCol, pairs)
    recs.join(clusters, idCol)
      .groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_members"),
        min(col(idCol)).as("canonical_id"),
        max(col(valueCol).cast("double")).as("survivor_value"),
        // money-style sum through DECIMAL(18,4): exact on 2-dp fixture
        // values, engine-portable (no FP association drift)
        sum(col(valueCol).cast(
          org.apache.spark.sql.types.DataTypes.createDecimalType(18, 4)))
          .cast("double").as("total_value"))
      .filter(col("n_members") > 1)
      .select("cluster_id", "canonical_id", "n_members",
        "survivor_value", "total_value")
  }
}
