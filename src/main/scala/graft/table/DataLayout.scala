package graft.table

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Physical data layout for scan-time pruning. The reference stores
  * parquet flat (one pickle → one file,
  * `/root/reference/backend/process/parsing.py:100-118`); at 100 TB the
  * layout IS the index: range-clustering on the dominant filter column
  * gives every file a tight min/max zone map, so a selective predicate
  * prunes whole files before a single row group is read (Spark's
  * parquet reader consults footers first, and partition-level listing
  * combined with `PushedFilters` skips non-overlapping files).
  */
object DataLayout {

  /** Write `df` range-clustered on `sortCols`: rows are range-partitioned
    * (global order across files) then sorted within each file, so file
    * min/max ranges are pairwise disjoint on the leading column.
    * `nFiles` sizes output files — pick `bytes / ~512 MB` at scale. */
  def clusterWrite(df: DataFrame, dir: String, sortCols: Seq[String],
      nFiles: Int): Unit =
    df.repartitionByRange(nFiles, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode("overwrite").parquet(dir)

  /** Per-file (min, max) of `column` for a parquet dir — the zone map a
    * clustered layout produces. Disjoint ranges = file-level pruning. */
  def fileRanges(df: DataFrame, column: String): DataFrame =
    df.groupBy(input_file_name().as("file"))
      .agg(min(col(column)).as("lo"), max(col(column)).as("hi"))

  /** Bucketed catalog table for CO-LOCATED joins: rows hash-partitioned
    * into `nBuckets` files on `bucketCols` at write time, so two tables
    * bucketed the same way join with NO exchange — the shuffle was paid
    * once at layout time instead of on every query. THE fact-to-fact
    * join strategy at 100 TB when neither side broadcasts (e.g.
    * lineitem ⋈ orders on orderkey). Registers `name` in the session
    * catalog (bucket metadata lives in the catalog, not the files —
    * plain dir reads can't see it). */
  def bucketWrite(df: DataFrame, name: String, bucketCols: Seq[String],
      nBuckets: Int): Unit = {
    val spark = df.sparkSession
    require(name.matches("[A-Za-z0-9_]+"), s"bad table name: $name")
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
    // a crashed run can leave the managed location behind with no
    // catalog entry — saveAsTable then refuses LOCATION_ALREADY_EXISTS
    val wh = java.nio.file.Paths.get(
      java.net.URI.create(spark.conf.get("spark.sql.warehouse.dir")).getPath)
    val orphan = wh.resolve(name)
    if (java.nio.file.Files.exists(orphan)) {
      val s = java.nio.file.Files.walk(orphan)
      try s.sorted(java.util.Comparator.reverseOrder())
        .iterator().forEachRemaining(p => java.nio.file.Files.delete(p))
      finally s.close()
    }
    df.write.mode("overwrite")
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(name)
  }
}
