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

  test("missing es.resource fails") {
    val df = graft.Tables.region(spark, SfDir)
    val e1 = intercept[Exception] {
      df.write.format("es-bulk").option("es.nodes", "/tmp/x")
        .mode("append").save()
    }
    assert(e1.getMessage.contains("es.resource")
      || e1.getCause != null)
  }

  // ---- live HTTP transport against a loopback JDK HttpServer (the
  // zero-egress stand-in for a real ES node; GraftServer proves the
  // same pattern on the serving side) ----

  /** (server, received-bodies, base-url); handler thread-safe — tasks
    * POST concurrently. Responds per `respond(nLines)`. */
  private def bulkServer(respond: Int => (Int, String))
      : (com.sun.net.httpserver.HttpServer,
         java.util.concurrent.ConcurrentLinkedQueue[(String, String)],
         String) = {
    import com.sun.net.httpserver.{HttpServer, HttpExchange}
    val recv = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]
    val srv = HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    srv.createContext("/_bulk", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      recv.add(ex.getRequestHeaders.getFirst("Content-Type") -> body)
      val n = body.split("\n").count(_.nonEmpty) / 2
      val (code, resp) = respond(n)
      val bytes = resp.getBytes("UTF-8")
      ex.sendResponseHeaders(code, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    srv.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))
    srv.start()
    (srv, recv, s"http://127.0.0.1:${srv.getAddress.getPort}")
  }

  private def okItems(n: Int): (Int, String) = (200,
    s"""{"took":1,"errors":false,"items":[${
      Seq.fill(n)("""{"index":{"status":201}}""").mkString(",")}]}""")

  test("HTTP transport: POSTs NDJSON chunks to <nodes>/_bulk and all " +
      "rows arrive exactly once") {
    val (srv, recv, base) = bulkServer(okItems)
    try {
      graft.Tables.nation(spark, SfDir)
        .select(col("n_nationkey"), col("n_name")).repartition(3)
        .write.format("es-bulk")
        .option("es.resource", "nations").option("es.nodes", base)
        .option("es.mapping.id", "n_nationkey")
        .option("es.batch.size.entries", "7")
        .mode("append").save()
      import scala.jdk.CollectionConverters._
      val got = recv.asScala.toSeq
      assert(got.nonEmpty)
      assert(got.forall(_._1 == "application/x-ndjson"))
      val lines = got.flatMap(_._2.split("\n").toSeq.filter(_.nonEmpty))
      val actions = lines.filter(_.contains("\"_index\":\"nations\""))
      assert(actions.length * 2 == lines.length,
        "every chunk is action/source line pairs")
      val ids = actions.map(a =>
        a.split("\"_id\":\"")(1).stripSuffix("\"}}")).sorted
      assert(ids == (0 until 25).map(_.toString).sorted,
        "all 25 nations indexed exactly once")
      // chunking honored over HTTP too
      assert(got.forall(_._2.split("\n").count(_.nonEmpty) <= 14))
    } finally srv.stop(0)
  }

  test("HTTP transport: per-item rejections are raise_on_error=False " +
      "(write succeeds); transport-level 5xx fails the write") {
    // every chunk reports one 429-rejected item -> write must succeed
    val (srv1, _, base1) = bulkServer(n => (200,
      s"""{"took":1,"errors":true,"items":[${
        (Seq("""{"index":{"status":429,"error":{"type":"circuit"}}}""") ++
          Seq.fill(n - 1)("""{"index":{"status":201}}""")).mkString(",")}]}"""))
    try {
      graft.Tables.region(spark, SfDir).select(col("r_regionkey"))
        .coalesce(1).write.format("es-bulk")
        .option("es.resource", "r").option("es.nodes", base1)
        .mode("append").save()
    } finally srv1.stop(0)
    // a 503 from the node is a TRANSPORT failure -> task (and write) fail
    val (srv2, _, base2) = bulkServer(_ => (503, """{"error":"down"}"""))
    try {
      val e = intercept[Exception] {
        graft.Tables.region(spark, SfDir).select(col("r_regionkey"))
          .coalesce(1).write.format("es-bulk")
          .option("es.resource", "r").option("es.nodes", base2)
          .mode("append").save()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil
        else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(m => m.contains("503") || m.contains("_bulk")))
    } finally srv2.stop(0)
  }

  test("HttpBulkTransport.tally counts item statuses the helpers.bulk " +
      "way (<300 success, >=300 failure; empty body lenient)") {
    assert(HttpBulkTransport.tally(
      """{"errors":false,"items":[{"index":{"status":201}},
        |{"index":{"status":200}}]}""".stripMargin) == (2, 0))
    assert(HttpBulkTransport.tally(
      """{"errors":true,"items":[{"index":{"status":201}},
        |{"index":{"status":429}},{"index":{"status":500}}]}"""
        .stripMargin) == (1, 2))
    assert(HttpBulkTransport.tally("") == (0, 0))
  }
}
