package graft.table

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC interop matching the reference's Postgres/MariaDB surface
  * (`/root/reference/backend/process/postgres.py`, `maria.py`): chunked
  * batch insert (chunk=100, `postgres.py:163`) becomes the JDBC writer's
  * `batchsize`; the fetch-by-key select becomes a pushed-down predicate.
  *
  * Exercised LIVE against embedded Derby (JdbcInteropSpec — the jar
  * ships with Spark): write, keyed read, partitioned range read, and
  * incremental append all round-trip through a real SQL database. No
  * network server exists in this build environment; against
  * Postgres/MariaDB only the JDBC URL changes.
  */
object JdbcInterop {

  /** S6 sink — append a frame to an RDB table; `batchsize` plays the
    * reference's execute_batch chunk, partition-level writes its
    * per-chunk commit isolation. */
  def writeTable(df: DataFrame, url: String, table: String,
      props: java.util.Properties, batchSize: Int = 100,
      columnTypes: Option[String] = None): Unit = {
    // columnTypes e.g. "title VARCHAR(128)": without it some dialects
    // map StringType to an unindexable LOB type (Derby: CLOB) that can't
    // even equality-compare — the reference schema uses VARCHAR keys
    val w = df.write.mode(SaveMode.Append).option("batchsize", batchSize)
    columnTypes.fold(w)(t => w.option("createTableColumnTypes", t))
      .jdbc(url, table, props)
  }

  /** S9 source — read with a pushdown predicate (the reference's
    * `SELECT * WHERE hashed_filepath = ?`): Spark sends the filter to
    * the database instead of fetching the table. The key column is
    * ANSI-quoted — Spark's JDBC writer creates case-sensitive quoted
    * identifiers, so a bare lowercase name would resolve to the wrong
    * (upper-cased) identifier on ANSI databases. */
  def readByKey(spark: SparkSession, url: String, table: String,
      props: java.util.Properties, keyCol: String, value: String): DataFrame =
    spark.read.jdbc(url, table,
      predicates = Array(s""""${keyCol.replace("\"", "\"\"")}"""" +
        s" = '${value.replace("'", "''")}'"), props)

  /** Partitioned parallel read for large tables (numPartitions-way
    * range scan on a numeric column — the 100 TB-side ingest shape). */
  def readPartitioned(spark: SparkSession, url: String, table: String,
      props: java.util.Properties, partCol: String, lower: Long, upper: Long,
      numPartitions: Int): DataFrame =
    spark.read.jdbc(url, table, partCol, lower, upper, numPartitions, props)
}
