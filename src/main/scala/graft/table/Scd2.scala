package graft.table

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type 2: a history table where each business
  * key carries versioned attribute rows with `valid_from` / `valid_to` /
  * `is_current`. The reference mutates rows in place (delete + re-insert,
  * `/root/reference/backend/process/postgres.py:196-210`); SCD2 is the
  * at-scale alternative that keeps every past state queryable.
  *
  * Pure functions: they RETURN the next history frame, so the write
  * lands wherever the caller points it — composing with
  * [[SnapshotCatalog.commitTagged]] gives versioned, exactly-once
  * dimension history. Shapes: one semi/anti-join per class of change on
  * the current slice only (the closed history never rewrites), all
  * broadcast-able when the batch is small.
  */
object Scd2 {

  /** Explicit duplicate-key policy: a batch carrying the same key twice
    * is REJECTED up front — silently merging it would open two
    * concurrent `is_current` rows for one key, corrupting the dimension
    * invariant for every later batch. A caller that wants last-wins
    * semantics must pre-dedup with its own explicit ordering (e.g.
    * `max_by(struct(*), event_ts)` per key) — unordered DataFrames have
    * no "last", so this library refuses to invent one. Cost: one
    * batch-sized aggregate per merge. */
  private def requireUniqueKeys(incoming: DataFrame, keyCol: String): Unit = {
    val dups = incoming.groupBy(keyCol).count()
      .filter(col("count") > 1).select(keyCol).head(3)
    require(dups.isEmpty,
      s"SCD2 batch has duplicate keys for '$keyCol' (e.g. " +
        dups.map(_.get(0)).mkString(", ") +
        "): pre-dedup with an explicit ordering before merging")
  }

  /** Bootstrap a history from the first batch. */
  def init(incoming: DataFrame, batchTs: Long,
      keyCol: Option[String] = None): DataFrame = {
    keyCol.foreach(requireUniqueKeys(incoming, _))
    incoming
      .withColumn("valid_from", lit(batchTs))
      .withColumn("valid_to", lit(null).cast("long"))
      .withColumn("is_current", lit(true))
  }

  /** Merge a batch at `batchTs`: new keys open rows; changed attributes
    * close the current row and open a new one; unchanged rows are
    * untouched; keys absent from the batch are left open (SCD2 has no
    * implicit deletes). Duplicate-key batches are rejected — see
    * [[requireUniqueKeys]]. */
  def merge(history: DataFrame, incoming: DataFrame, keyCol: String,
      batchTs: Long): DataFrame = {
    val attrCols = incoming.columns.filterNot(_ == keyCol).toSeq
    val meta = Seq("valid_from", "valid_to", "is_current")
    require(history.columns.toSet == (incoming.columns ++ meta).toSet,
      "history schema must be incoming schema + valid_from/valid_to/is_current")
    requireUniqueKeys(incoming, keyCol)

    val cur    = history.filter(col("is_current"))
    val closed = history.filter(!col("is_current"))

    val changedKeys = cur.as("c").join(incoming.as("i"), keyCol)
      .filter(attrCols.map(a => !(col(s"c.$a") <=> col(s"i.$a")))
        .reduceOption(_ || _).getOrElse(lit(false)))
      .select(keyCol)
    val newKeys = incoming.select(keyCol)
      .join(cur.select(keyCol), Seq(keyCol), "left_anti")

    val toClose = cur.join(changedKeys, Seq(keyCol), "left_semi")
      .withColumn("valid_to", lit(batchTs))
      .withColumn("is_current", lit(false))
    val untouched = cur.join(changedKeys, Seq(keyCol), "left_anti")
    val opened = incoming
      .join(changedKeys.unionByName(newKeys), Seq(keyCol), "left_semi")
      .withColumn("valid_from", lit(batchTs))
      .withColumn("valid_to", lit(null).cast("long"))
      .withColumn("is_current", lit(true))

    closed.unionByName(toClose).unionByName(untouched).unionByName(opened)
  }

  /** The dimension as of time `ts` — rows whose validity interval
    * covers it. */
  def asOf(history: DataFrame, ts: Long): DataFrame =
    history.filter(col("valid_from") <= ts &&
      (col("valid_to").isNull || col("valid_to") > ts))
      .drop("valid_from", "valid_to", "is_current")
}
