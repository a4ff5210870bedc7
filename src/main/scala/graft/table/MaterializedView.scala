package graft.table

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataTypes

/** Incremental maintenance of an aggregate materialized view — the
  * classic view-maintenance delta algebra (Gupta & Mumick) over
  * [[SnapshotCatalog]] snapshots: `MV(v2) = MV(v1) ⊎ Δ`, where Δ is
  * computed from the keyed diff of the two snapshots, NEVER by
  * re-aggregating the corpus.
  *
  * Scale shape (100 TB): the delta pass costs O(|changed rows|) — two
  * anti-joins and one filtered inner join on the snapshot key (the same
  * plan as [[SnapshotCatalog.diff]]) followed by a partial-agg groupBy
  * over delta rows only. The merge into MV state is a join on the group
  * key; count/sum are self-commutative, so retractions are just negated
  * contributions (no rescan, no per-group history). Groups whose count
  * reaches zero disappear — identical to a fresh refresh. When the MV
  * itself is snapshot-versioned, the merge writes only touched groups
  * (copy-on-write on the group-key partitioning); here the merged frame
  * is returned for the caller to commit. */
object MaterializedView {

  private val Dec = DataTypes.createDecimalType(18, 4)

  /** Full refresh: (group, n_rows, total) from a snapshot. The money
    * total runs through DECIMAL(18,4) — exact on 2-dp fixture values,
    * engine-portable. */
  def refresh(snap: DataFrame, groupCol: String,
      valueCol: String): DataFrame =
    snap.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_rows"),
        sum(col(valueCol).cast(Dec)).as("total"))

  /** Incremental step: apply the v1→v2 delta to MV state `mv` (the
    * output shape of [[refresh]] on v1) and return MV state equal to
    * `refresh(v2)`. Only `|changed rows|` of the snapshots are
    * aggregated; the corpus is never rescanned. */
  def maintain(mv: DataFrame, oldSnap: DataFrame, newSnap: DataFrame,
      keyCol: String, groupCol: String, valueCol: String): DataFrame = {
    val nonKey = newSnap.columns.filterNot(_ == keyCol).toSeq
    // changed-key classification, inlined from SnapshotCatalog.diff so
    // BOTH sides of an update contribute (retract old, add new)
    val inserted = newSnap.join(oldSnap.select(keyCol), Seq(keyCol),
      "left_anti")
    val deleted = oldSnap.join(newSnap.select(keyCol), Seq(keyCol),
      "left_anti")
    val updatedKeys = newSnap.as("n").join(oldSnap.as("o"), Seq(keyCol))
      .filter(nonKey.map(c => !(col(s"n.$c") <=> col(s"o.$c")))
        .reduceOption(_ || _).getOrElse(lit(false)))
      .select(col(keyCol))
    val plus = inserted
      .unionByName(newSnap.join(updatedKeys, Seq(keyCol), "left_semi"))
      .select(col(groupCol), lit(1L).as("dn"),
        col(valueCol).cast(Dec).as("dv"))
    val minus = deleted
      .unionByName(oldSnap.join(updatedKeys, Seq(keyCol), "left_semi"))
      .select(col(groupCol), lit(-1L).as("dn"),
        (col(valueCol).cast(Dec) * -1).cast(Dec).as("dv"))
    val delta = plus.unionByName(minus)
      .groupBy(col(groupCol))
      .agg(sum(col("dn")).as("dn"), sum(col("dv")).as("dv"))
    mv.join(delta, Seq(groupCol), "full_outer")
      .select(col(groupCol),
        (coalesce(col("n_rows"), lit(0L)) + coalesce(col("dn"), lit(0L)))
          .as("n_rows"),
        (coalesce(col("total"), lit(0).cast(Dec)) +
          coalesce(col("dv"), lit(0).cast(Dec))).cast(Dec).as("total"))
      .filter(col("n_rows") > 0)
  }
}
