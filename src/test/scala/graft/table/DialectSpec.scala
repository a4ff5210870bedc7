package graft.table

import java.util.Properties

import graft.SparkSpec

/** The reference's MariaDB dialect rewrite (`maria.py:105-118`) as
  * executable laws, plus a LIVE leg: the same type-mapping code path
  * ([[Dialect.sparkColumnTypes]]) drives a real engine (Derby — the
  * only embedded SQL engine in this zero-egress build) and the created
  * physical schema is read back from the engine's own catalog. The
  * MySQL-isms (AUTO_INCREMENT, utf8mb4, backticks) can't run live
  * here, so they're pinned against the reference's recorded output
  * shape instead. */
class DialectSpec extends SparkSpec {
  import Dialect._

  test("maria rewrite laws: SERIAL -> INT AUTO_INCREMENT, timezone " +
      "stripped, VARCHAR(300) preserved (maria.py:108-110)") {
    assert(MariaDb.rewriteType("SERIAL PRIMARY KEY") ===
      "INT AUTO_INCREMENT PRIMARY KEY")
    assert(MariaDb.rewriteType(
      "TIMESTAMP WITH TIME ZONE DEFAULT CURRENT_TIMESTAMP") ===
      "TIMESTAMP DEFAULT CURRENT_TIMESTAMP")
    assert(MariaDb.rewriteType("VARCHAR(300) NOT NULL") ===
      "VARCHAR(300) NOT NULL")
    // plain TIMESTAMP (already timezone-free) passes through
    assert(MariaDb.rewriteType("TIMESTAMP DEFAULT CURRENT_TIMESTAMP") ===
      "TIMESTAMP DEFAULT CURRENT_TIMESTAMP")
  }

  test("maria DDL over the reference's document schema matches the " +
      "reference's rendered shape (schema.py maria_schema)") {
    val ddl = MariaDb.createTable("pjt_001", DocSchema)
    // identifier quoting + table options (maria.py:111,120)
    assert(ddl.startsWith("CREATE TABLE IF NOT EXISTS `pjt_001` ("))
    assert(ddl.endsWith(") ENGINE=InnoDB DEFAULT CHARSET=utf8mb4;"))
    assert(ddl.contains("`id` VARCHAR(300) NOT NULL"))
    assert(ddl.contains("`page_content` TEXT NOT NULL"))
    // the TZ strip is what turns pg_schema's created_at into
    // maria_schema's created_at (schema.py:15 vs :34)
    assert(ddl.contains(
      "`created_at` TIMESTAMP DEFAULT CURRENT_TIMESTAMP"))
    assert(!ddl.contains("WITH TIME ZONE"))
    // postgres renders the SAME config without any rewrite
    val pg = Postgres.createTable("pjt_001", DocSchema)
    assert(pg.contains(
      "created_at TIMESTAMP WITH TIME ZONE DEFAULT CURRENT_TIMESTAMP"))
    assert(!pg.contains("`"))
    assert(pg.endsWith(");"))
  }

  test("insert statement shape matches the reference's chunked insert " +
      "(maria.py:146-149: backticked columns, positional placeholders)") {
    val sql = MariaDb.insertSql("docs", Seq("id", "page"))
    assert(sql === "INSERT INTO `docs` (`id`, `page`) VALUES (?, ?)")
    assert(Postgres.insertSql("docs", Seq("id", "page")) ===
      "INSERT INTO docs (id, page) VALUES (?, ?)")
  }

  test("sparkColumnTypes maps string columns to VARCHAR(300) and " +
      "leaves text columns to the dialect's native LOB default") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", StringType), StructField("n", LongType),
      StructField("page_content", StringType)))
    // text cols omitted: Spark parses this string with its OWN DDL
    // parser, so dialect LOB names (LONG VARCHAR / TEXT) can't appear;
    // omission = the dialect's default string LOB = the reference's TEXT
    assert(sparkColumnTypes(schema, textCols = Set("page_content")) ===
      "`id` VARCHAR(300)")
    assert(sparkColumnTypes(schema) ===
      "`id` VARCHAR(300), `page_content` VARCHAR(300)")
    // non-identifier column names survive: backquoted, backticks doubled
    val odd = StructType(Seq(StructField("order by", StringType),
      StructField("we`ird", StringType)))
    assert(sparkColumnTypes(odd) ===
      "`order by` VARCHAR(300), `we``ird` VARCHAR(300)")
  }

  test("LIVE: sparkColumnTypes drives a real engine and the catalog " +
      "reports VARCHAR(300) — not the dialect's LOB default") {
    import spark.implicits._
    val dbDir = java.nio.file.Files
      .createTempDirectory("graft_dialect_").resolve("db").toString
    val url = s"jdbc:derby:$dbDir;create=true"
    val props = new Properties()
    props.setProperty("driver",
      "org.apache.derby.iapi.jdbc.AutoloadedDriver")
    val df = Seq(("d1", "body one", 3L), ("d2", "body two", 7L))
      .toDF("id", "page_content", "n_chars")
    JdbcInterop.writeTable(df, url, "dialect_docs", props,
      columnTypes = Some(sparkColumnTypes(df.schema,
        textCols = Set("page_content"))))
    // read the PHYSICAL schema from the live catalog
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      // identifier case is engine-policy (Derby may fold unquoted names
      // to upper); match the table and key columns case-insensitively
      val md = conn.getMetaData.getColumns(null, null, "%", null)
      var types = Map.empty[String, (String, Int)]
      while (md.next())
        if (md.getString("TABLE_NAME").equalsIgnoreCase("dialect_docs"))
          types += md.getString("COLUMN_NAME").toLowerCase(
            java.util.Locale.ROOT) ->
            ((md.getString("TYPE_NAME"), md.getInt("COLUMN_SIZE")))
      assert(types("id") === (("VARCHAR", 300)))
      // omitted text col falls back to Derby's native LOB
      assert(types("page_content")._1 === "CLOB")
      assert(types("n_chars")._1 === "BIGINT")
    } finally conn.close()
    // keyed read still round-trips through the VARCHAR key
    val one = JdbcInterop.readByKey(spark, url, "dialect_docs", props,
      "id", "d2")
    assert(one.collect().map(_.getAs[Long]("n_chars")).toSeq === Seq(7L))
  }
}
