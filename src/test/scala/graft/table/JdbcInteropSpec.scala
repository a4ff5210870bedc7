package graft.table

import java.util.Properties

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** LIVE RDB round-trip against embedded Derby (ships with Spark — the
  * same jar the Hive metastore uses), closing the "plan-level only" gap:
  * the reference's insert / select-by-key / chunked-batch semantics run
  * against a real SQL database here, no server needed. */
class JdbcInteropSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dbDir = java.nio.file.Files
    .createTempDirectory("graft_derby_").resolve("db").toString
  private lazy val url = s"jdbc:derby:$dbDir;create=true"
  private def props: Properties = {
    val p = new Properties()
    p.setProperty("driver", "org.apache.derby.iapi.jdbc.AutoloadedDriver")
    p
  }

  private lazy val rows = Seq(
    (1L, "alpha", "en", 120L),
    (2L, "bravo", "ko", 240L),
    (3L, "charlie", "en", 360L),
    (4L, "delta", "de", 480L)
  ).toDF("doc_id", "title", "lang", "n_chars")

  test("writeTable + full read round-trips rows through a live database") {
    JdbcInterop.writeTable(rows, url, "docs", props, batchSize = 2)
    val back = spark.read.jdbc(url, "docs", props)
    assert(back.count() === 4)
    assert(back.orderBy("doc_id").collect().map(_.getString(1)).toSeq ===
      Seq("alpha", "bravo", "charlie", "delta"))
  }

  test("readByKey pushes the predicate and returns only the keyed row") {
    JdbcInterop.writeTable(rows, url, "docs_bykey", props,
      columnTypes = Some("title VARCHAR(128), lang VARCHAR(16)"))
    val one = JdbcInterop.readByKey(spark, url, "docs_bykey", props,
      "title", "bravo")
    val got = one.collect()
    assert(got.length === 1)
    assert(got.head.getAs[Long]("doc_id") === 2L)
    // quoting survives a value with an apostrophe (no injection, no crash)
    val none = JdbcInterop.readByKey(spark, url, "docs_bykey", props,
      "title", "o'brien")
    assert(none.count() === 0)
  }

  test("readPartitioned range-splits but returns the whole table") {
    JdbcInterop.writeTable(rows, url, "docs_part", props)
    val part = JdbcInterop.readPartitioned(spark, url, "docs_part", props,
      "doc_id", lower = 1L, upper = 4L, numPartitions = 3)
    assert(part.rdd.getNumPartitions === 3)
    assert(part.select(sum("n_chars")).as[Long].head() === 1200L)
  }

  test("append is chunk-committed: a second batch lands without clobbering") {
    JdbcInterop.writeTable(rows, url, "docs_inc", props)
    JdbcInterop.writeTable(
      Seq((5L, "echo", "en", 600L)).toDF("doc_id", "title", "lang", "n_chars"),
      url, "docs_inc", props)
    val back = spark.read.jdbc(url, "docs_inc", props)
    assert(back.count() === 5)
  }
}
