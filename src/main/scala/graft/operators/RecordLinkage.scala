package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Record linkage / entity resolution (the Fellegi-Sunter / Splink
  * shape): candidate pairs via BLOCKING, pairwise field-similarity
  * scoring, threshold, transitive closure into entities, and a
  * survivorship pass that elects one golden record per entity.
  *
  * Scale design (100 TB): candidate generation is a self-equi-join on
  * the blocking key — pair cost is Σ|block|², never |corpus|², so the
  * blocking key IS the scale knob (standard ER practice). Oversized,
  * non-discriminative blocks are dropped by `maxBlockSize` BEFORE the
  * join (a broadcast of the offending keys — block-count stats are
  * metadata-scale), the same hot-key discipline as the dedup family.
  * Clustering reuses [[Dedup.nearDupClusters]] (pregel-shape label
  * propagation); survivorship is one partial-agg-friendly groupBy over
  * the clustered records. */
object RecordLinkage {

  /** Candidate pairs within blocks, verified by Levenshtein distance on
    * `nameCol` ≤ `maxEdit` and scored: 0.7·name similarity (1 − dist /
    * max-len) + 0.3·numeric proximity (1 / (1 + |Δvalue|)). Returns
    * (a, b, edit_dist, score) with a < b, score ≥ minScore. */
  def linkPairs(recs: DataFrame, idCol: String, nameCol: String,
      blockKey: Column, valueCol: String, maxEdit: Int,
      minScore: Double, maxBlockSize: Int = 10000): DataFrame = {
    val base = recs.select(col(idCol).as("id"), col(nameCol).as("nm"),
      col(valueCol).cast("double").as("v"), blockKey.as("blk"))
    val oversized = base.groupBy("blk").count()
      .filter(col("count") > maxBlockSize).select("blk")
    val blocked = base.join(broadcast(oversized), Seq("blk"), "left_anti")
    val l = blocked.select(col("blk"), col("id").as("a"),
      col("nm").as("nm_a"), col("v").as("v_a"))
    val r = blocked.select(col("blk"), col("id").as("b"),
      col("nm").as("nm_b"), col("v").as("v_b"))
    l.join(r, Seq("blk")).filter(col("a") < col("b"))
      .withColumn("edit_dist",
        levenshtein(col("nm_a"), col("nm_b")).cast("long"))
      .filter(col("edit_dist") <= maxEdit)
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
