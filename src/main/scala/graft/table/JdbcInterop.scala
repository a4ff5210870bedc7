package graft.table

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC interop matching the reference's Postgres/MariaDB surface
  * (`/root/reference/backend/process/postgres.py`, `maria.py`): chunked
  * batch insert (chunk=100, `postgres.py:163`) becomes the JDBC writer's
  * `batchsize`; the fetch-by-key select becomes a pushed-down predicate.
  *
  * NOTE: no database server exists in this build environment (zero
  * egress), so these helpers are exercised only at the plan level; the
  * options mirror the reference's tuning and the parquet-backed
  * [[ParquetCatalog]] is the tested storage path.
  */
object JdbcInterop {

  /** S6 sink — append a frame to an RDB table; `batchsize` plays the
    * reference's execute_batch chunk, partition-level writes its
    * per-chunk commit isolation. */
  def writeTable(df: DataFrame, url: String, table: String,
      props: java.util.Properties, batchSize: Int = 100): Unit =
    df.write.mode(SaveMode.Append)
      .option("batchsize", batchSize)
      .jdbc(url, table, props)

  /** S9 source — read with a pushdown predicate (the reference's
    * `SELECT * WHERE hashed_filepath = ?`): Spark sends the filter to
    * the database instead of fetching the table. */
  def readByKey(spark: SparkSession, url: String, table: String,
      props: java.util.Properties, keyCol: String, value: String): DataFrame =
    spark.read.jdbc(url, table,
      predicates = Array(s"$keyCol = '${value.replace("'", "''")}'"), props)

  /** Partitioned parallel read for large tables (numPartitions-way
    * range scan on a numeric column — the 100 TB-side ingest shape). */
  def readPartitioned(spark: SparkSession, url: String, table: String,
      props: java.util.Properties, partCol: String, lower: Long, upper: Long,
      numPartitions: Int): DataFrame =
    spark.read.jdbc(url, table, partCol, lower, upper, numPartitions, props)
}
