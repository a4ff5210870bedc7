package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

class EsBulkSinkSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def ndjsonFiles(dir: String): Seq[java.nio.file.Path] = {
    val s = Files.list(Paths.get(dir))
    try s.iterator().asScala.toSeq
      .filter(_.toString.endsWith(".ndjson")).sortBy(_.toString)
    finally s.close()
  }

  test("bulk payloads: action/source pairs, _id mapping, " +
      "chunking at es.batch.size.entries") {
    val out = Files.createTempDirectory("graft_esbulk_").toString
    val docs = graft.Tables.documents(spark, SfDir)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .filter(col("doc_id") < 137) // deterministic subset (limit isn't)
      .repartition(3)
    docs.write.format("es-bulk")
      .option("es.resource", "documents")
      .option("es.nodes", out)
      .option("es.mapping.id", "doc_id")
      .option("es.batch.size.entries", "50")
      .mode("append").save()

    val files = ndjsonFiles(out)
    assert(files.nonEmpty)
    val lines = files.flatMap(f =>
      new String(Files.readAllBytes(f), "UTF-8").split("\n").toSeq)
    assert(lines.length == 137 * 2, "one action + one source per row")
    val actions = lines.grouped(2).map(_.head).toSeq
    val sources = lines.grouped(2).map(_.last).toSeq
    assert(actions.forall(_.startsWith(
      """{"index":{"_index":"documents","_id":""")))
    assert(sources.forall(s => s.startsWith("{") && s.contains(
      "\"doc_id\":")))
    // ids in actions = the doc_ids written
    val ids = actions.map(a =>
      a.split("\"_id\":\"")(1).stripSuffix("\"}}")).toSet
    val expected = docs.select(col("doc_id").cast("string"))
      .collect().map(_.getString(0)).toSet
    assert(ids == expected)
    // chunking: every file ≤ 50 entries, and per-partition chunk count
    // is ceil(rows/50)
    val perFile = files.map(f => new String(Files.readAllBytes(f), "UTF-8")
      .split("\n").length / 2)
    assert(perFile.forall(_ <= 50))
  }

  test("retry idempotency: re-writing the same frame lands the same " +
      "chunk files (atomic overwrite, no duplicates)") {
    val out = Files.createTempDirectory("graft_esbulk2_").toString
    val df = graft.Tables.nation(spark, SfDir)
      .select(col("n_nationkey"), col("n_name")).coalesce(1)
    def go(): Unit = df.write.format("es-bulk")
      .option("es.resource", "nations").option("es.nodes", out)
      .option("es.mapping.id", "n_nationkey")
      .mode("append").save()
    go()
    val first = ndjsonFiles(out).map(f =>
      f.getFileName.toString -> Files.size(f))
    go() // a task retry / re-run re-sends the same chunk ids
    val second = ndjsonFiles(out).map(f =>
      f.getFileName.toString -> Files.size(f))
    assert(first == second)
  }

  test("missing es.resource fails; http nodes name the production leg") {
    val df = graft.Tables.region(spark, SfDir)
    val e1 = intercept[Exception] {
      df.write.format("es-bulk").option("es.nodes", "/tmp/x")
        .mode("append").save()
    }
    assert(e1.getMessage.contains("es.resource")
      || e1.getCause != null)
    val e2 = intercept[Exception] {
      df.write.format("es-bulk")
        .option("es.resource", "r")
        .option("es.nodes", "http://es.example:9200")
        .mode("append").save()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e2).exists(_.contains("zero-egress")))
  }
}
