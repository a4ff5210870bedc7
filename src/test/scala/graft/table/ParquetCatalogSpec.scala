package graft.table

import java.nio.file.Files

import org.apache.spark.sql.types._

import graft.SparkSpec

class ParquetCatalogSpec extends SparkSpec {
  import spark.implicits._

  private def freshCatalog() =
    ParquetCatalog(spark, Files.createTempDirectory("cat").toString)

  private val schema = StructType(Seq(
    StructField("id", StringType),
    StructField("page_content", StringType),
    StructField("page", IntegerType)))

  test("create / exists / list / drop (D1/D2/D3/D5)") {
    val c = freshCatalog()
    assert(c.listTables() === Seq.empty)
    c.createTable("docs", schema)
    c.createTable("docs", schema) // IF NOT EXISTS: idempotent
    c.createTable("aux", schema)
    assert(c.listTables() === Seq("aux", "docs"))
    assert(c.tableExists("docs"))
    c.dropTable("docs")
    assert(!c.tableExists("docs"))
    assert(c.listTables() === Seq("aux"))
    c.dropTable("docs") // IF EXISTS: idempotent
    intercept[IllegalArgumentException](c.createTable("../evil", schema))
  }

  test("insert / select order-limit / selectByKey / distinct (S6/O1/P1/A1)") {
    val c = freshCatalog()
    c.createTable("docs", schema)
    c.insert("docs", Seq(("c", "x", 1), ("a", "y", 2), ("b", "y", 3))
      .toDF("id", "page_content", "page"))
    c.insert("docs", Seq(("d", "z", 4)).toDF("id", "page_content", "page"))
    assert(c.table("docs").count() === 4)
    val top2 = c.select("docs", "id", Some(2)).collect().map(_.getString(0))
    assert(top2 === Array("a", "b"))
    assert(c.selectByKey("docs", "page_content", "y").count() === 2)
    assert(c.distinctValues("docs", "page_content").count() === 3)
  }

  test("deleteByIds: anti-join + atomic swap, returns count (D4)") {
    val c = freshCatalog()
    c.createTable("docs", schema)
    c.insert("docs", Seq(("a", "x", 1), ("b", "y", 2), ("c", "z", 3))
      .toDF("id", "page_content", "page"))
    assert(c.deleteByIds("docs", "id", Seq("a", "c", "nope")) === 2L)
    assert(c.table("docs").select("id").as[String].collect().toSeq === Seq("b"))
    assert(c.deleteByIds("docs", "id", Seq("zzz")) === 0L)
  }

  test("upsert: same-key rows replaced, new keys appended") {
    val c = freshCatalog()
    c.createTable("docs", schema)
    c.insert("docs", Seq(("a", "old", 1), ("b", "keep", 2))
      .toDF("id", "page_content", "page"))
    val (updated, inserted) = c.upsert("docs", "id",
      Seq(("a", "new", 9), ("c", "fresh", 3))
        .toDF("id", "page_content", "page"))
    assert((updated, inserted) === ((1L, 1L)))
    val rows = c.table("docs").orderBy("id").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSeq
    assert(rows === Seq(("a", "new", 9), ("b", "keep", 2), ("c", "fresh", 3)))
  }

  test("compact: many small files become few, rows unchanged") {
    import spark.implicits._
    val c = freshCatalog()
    val df = (1L to 1000L).map(i => (i, s"row$i")).toDF("id", "v")
    c.createTable("frag", df.schema)
    // simulate accreted appends: 16-way write = 16 small files
    c.insert("frag", df.repartition(16))
    val (before, after) = c.compact("frag")
    assert(before >= 16L)
    assert(after === 1L) // 1000 tiny rows << target file size
    assert(c.table("frag").count() === 1000L)
    assert(c.table("frag").agg(org.apache.spark.sql.functions.sum("id"))
      .head().getLong(0) === 500500L)
  }

  test("full mutation flow under the manifest commit store") {
    // the catalog's swap-based mutations (delete/upsert/compact) run
    // unchanged over the object-store protocol: data never renamed live,
    // every publish is a manifest append + link flip
    val c = ParquetCatalog(spark,
      Files.createTempDirectory("cat_ms").toString, ManifestCommitStore)
    c.createTable("docs", schema)
    c.insert("docs", Seq(("a", "x", 1), ("b", "y", 2), ("c", "z", 3))
      .toDF("id", "page_content", "page"))
    assert(c.deleteByIds("docs", "id", Seq("a")) === 1L)
    assert(Files.isSymbolicLink(
      java.nio.file.Paths.get(c.baseDir, "docs")))
    val (up, ins) = c.upsert("docs", "id",
      Seq(("b", "Y2", 2), ("d", "w", 4)).toDF("id", "page_content", "page"))
    assert((up, ins) === ((1L, 1L)))
    assert(c.table("docs").select("id").as[String].collect().sorted ===
      Seq("b", "c", "d"))
    val (nb, na) = c.compact("docs")
    assert(nb >= na && na >= 1)
    assert(c.table("docs").count() === 3)
    assert(c.listTables() === Seq("docs")) // no protocol dirs leak through

    // drop removes the manifest log too: a recreated table must NOT
    // resolve the stale manifest and adopt the dropped data
    c.dropTable("docs")
    assert(c.listTables() === Seq.empty)
    c.createTable("docs", schema)
    c.insert("docs", Seq(("z", "fresh", 9)).toDF("id", "page_content", "page"))
    assert(c.deleteByIds("docs", "id", Seq("none")) === 0L) // forces a swap
    assert(c.table("docs").select("id").as[String].collect().toSeq ===
      Seq("z"))
  }

  test("insertFromCsv: header + null fill (S7)") {
    val c = freshCatalog()
    val csv = Files.createTempFile("in", ".csv")
    Files.write(csv, "id,page_content,page\n1,hello,1\n2,,2\n".getBytes)
    val n = c.insertFromCsv("fromcsv", csv.toString)
    assert(n === 2L)
    val rows = c.table("fromcsv").orderBy("id").collect()
    assert(rows(1).getString(1) === "") // fillna('')
  }
}
