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
}
