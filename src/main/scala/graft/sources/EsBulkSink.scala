package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.graftext.JsonBridge
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The S8 INTEROP leg (round-7 verdict item 10): an Elasticsearch
  * `_bulk` sink shaped like the `elasticsearch-spark` writer —
  * `df.write.format("es-bulk").option("es.resource", idx)...save()` —
  * so a user with an EXISTING ES cluster indexes straight from a
  * DataFrame (the engine-internal index tables, `graft.index
  * .SearchIndex`, stay the semantic home of S8; this is the bridge
  * out). Mirrors the reference's `helpers.bulk(es,
  * {_index, _id, _source})` protocol (`backend/process/
  * elasticsearch_index.py:122-172`): NDJSON action+source line pairs,
  * chunked every `es.batch.size.entries` rows (500, the
  * `helpers.bulk` default the reference runs with).
  *
  * Options (elasticsearch-hadoop names):
  *  - `es.resource`  (required) target index
  *  - `es.nodes`     (required) transport address; a filesystem path
  *    or `file:` URI selects the TEST-DOUBLE transport (bulk payloads
  *    land as `part-<partition>-<seq>.ndjson`); `http(s)://...` is the
  *    PRODUCTION wiring — a [[BulkTransport]] POSTing each payload to
  *    `<nodes>/_bulk` — deliberately not constructible in this
  *    zero-egress build (it throws, documenting the seam).
  *  - `es.mapping.id` (optional) column supplying `_id` (reference
  *    uses the row key, `elasticsearch_index.py:140-142`); absent →
  *    no `_id`, ES auto-assigns.
  *
  * Scale + exactly-once shape: each task writes its own partition's
  * chunks; chunk ids are (partitionId, sequence) — DETERMINISTIC under
  * retry, so a speculative or re-attempted task re-sends byte-identical
  * payloads to the same chunk ids and the transport's atomic
  * write-then-rename (or ES's idempotent index-by-_id) deduplicates —
  * the same versioned-sink discipline as `StreamIngest`. Rows are
  * serialized by Catalyst's own JSON writer ([[JsonBridge]]), so
  * documents match `to_json` semantics exactly. */
class EsBulkDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "es-bulk"
  override def supportsExternalMetadata(): Boolean = true
  // write-only source: the schema is whatever DataFrame is written
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType()
  override def getTable(schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new EsBulkTable(schema)
}

final class EsBulkTable(writeSchema: StructType)
    extends Table with SupportsWrite {
  override def name(): String = "es-bulk"
  override def schema(): StructType = writeSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      // overwrite mode: ES indexing by _id is an upsert — truncate is
      // accepted and means "the target index owns dedup", per the
      // reference's re-index flow
      override def truncate(): WriteBuilder = this
      override def build(): Write = {
        val opts = info.options()
        val resource = require(opts, "es.resource")
        val nodes = require(opts, "es.nodes")
        val idCol = Option(opts.get("es.mapping.id"))
        val chunk = Option(opts.get("es.batch.size.entries"))
          .map(_.toInt).getOrElse(500)
        val idIdx = idCol.map { c =>
          val i = info.schema().fieldIndex(c)
          i
        }
        new EsBulkWrite(info.schema(), resource,
          BulkTransport.forNodes(nodes), idIdx, chunk)
      }
    }

  private def require(opts: CaseInsensitiveStringMap, k: String): String = {
    val v = opts.get(k)
    if (v == null || v.isEmpty)
      throw new IllegalArgumentException(s"es-bulk sink requires option $k")
    v
  }
}

final class EsBulkWrite(schema: StructType, resource: String,
    transport: BulkTransport, idIdx: Option[Int], chunkEntries: Int)
    extends Write with BatchWrite with Serializable {
  override def toBatch: BatchWrite = this
  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new EsBulkWriterFactory(schema, resource, transport, idIdx,
      chunkEntries)
  // chunks became visible atomically at flush (transport contract);
  // nothing to publish at job level
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

final class EsBulkWriterFactory(schema: StructType, resource: String,
    transport: BulkTransport, idIdx: Option[Int], chunkEntries: Int)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new EsBulkWriter(schema, resource, transport, idIdx, chunkEntries,
      partitionId)
}

final class EsBulkWriter(schema: StructType, resource: String,
    transport: BulkTransport, idIdx: Option[Int], chunkEntries: Int,
    partitionId: Int) extends DataWriter[InternalRow] {

  private val json = JsonBridge.encoder(schema)
  private val buf = new StringBuilder
  private var inChunk = 0
  private var seq = 0

  private def esc(s: String): String = {
    val b = new StringBuilder(s.length + 8)
    s.foreach {
      case '"' => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.toString
  }

  override def write(row: InternalRow): Unit = {
    val action = idIdx match {
      case Some(i) =>
        val id = row.get(i, schema(i).dataType)
        s"""{"index":{"_index":"${esc(resource)}","_id":"${
          esc(String.valueOf(id))}"}}"""
      case None => s"""{"index":{"_index":"${esc(resource)}"}}"""
    }
    buf.append(action).append('\n').append(json(row)).append('\n')
    inChunk += 1
    if (inChunk >= chunkEntries) flush()
  }

  private def flush(): Unit = if (inChunk > 0) {
    transport.send(resource, s"part-$partitionId-$seq",
      buf.toString.getBytes(StandardCharsets.UTF_8))
    buf.clear()
    inChunk = 0
    seq += 1
  }

  override def commit(): WriterCommitMessage = {
    flush()
    new WriterCommitMessage {}
  }
  override def abort(): Unit = () // retried task re-sends the same ids
  override def close(): Unit = ()
}

/** Delivery seam for one `_bulk` payload. Implementations must make a
  * chunk visible ATOMICALLY and treat a re-send of the same `chunkId`
  * as idempotent (task retries re-send byte-identical payloads). */
trait BulkTransport extends Serializable {
  def send(resource: String, chunkId: String, payload: Array[Byte]): Unit
}

object BulkTransport {
  /** `file:`/plain paths → filesystem double; `http(s)` → the
    * production leg: [[HttpBulkTransport]] POSTing each payload to
    * `<es.nodes>/_bulk`. */
  def forNodes(nodes: String): BulkTransport =
    if (nodes.startsWith("http://") || nodes.startsWith("https://"))
      new HttpBulkTransport(nodes)
    else new FileBulkTransport(
      if (nodes.startsWith("file:"))
        Paths.get(java.net.URI.create(nodes)).toString
      else nodes)
}

/** Production transport: POST each chunk to `<nodes>/_bulk` as
  * `application/x-ndjson`, with the reference's `helpers.bulk(...,
  * raise_on_error=False)` accounting (`backend/process/
  * elasticsearch_index.py:160-165`): per-ITEM rejections (the response
  * body's `"errors": true` + item statuses ≥ 300) are counted and
  * logged, never thrown — the caller's write completes and the
  * success/error split is the log line, exactly as `successes, errors =
  * helpers.bulk(...)` behaves. TRANSPORT-level failures (non-2xx HTTP
  * status, connect/IO errors) DO throw, as `helpers.bulk` raises
  * `TransportError` — a retried Spark task then re-sends the same
  * deterministic chunk ids and ES's index-by-_id upsert deduplicates.
  *
  * Scale notes: one `HttpClient` per executor JVM (lazily built — the
  * transport ships serialized inside the writer factory and
  * `HttpClient` is not `Serializable`); requests are synchronous per
  * task, so cluster-wide concurrency = task parallelism, the same
  * back-pressure shape as elasticsearch-hadoop's rest layer. */
final class HttpBulkTransport(nodes: String) extends BulkTransport {
  import java.net.http.{HttpClient, HttpRequest, HttpResponse}
  import java.time.Duration

  private val base = if (nodes.endsWith("/")) nodes.dropRight(1) else nodes

  @transient private lazy val client: HttpClient = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(30)).build()

  override def send(resource: String, chunkId: String,
      payload: Array[Byte]): Unit = {
    val req = HttpRequest.newBuilder(java.net.URI.create(s"$base/_bulk"))
      .header("Content-Type", "application/x-ndjson")
      .timeout(Duration.ofMinutes(2))
      .POST(HttpRequest.BodyPublishers.ofByteArray(payload))
      .build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new java.io.IOException(
        s"es-bulk POST $base/_bulk chunk $chunkId: HTTP ${
          resp.statusCode()} ${resp.body().take(500)}")
    // raise_on_error=False: item failures are counted + warned, never
    // thrown — only the transport itself may fail the task
    val (ok, failed) = HttpBulkTransport.tally(resp.body())
    HttpBulkTransport.log(resource, chunkId, ok, failed)
  }
}

object HttpBulkTransport {
  /** Minimal `_bulk` response accounting: (successes, failures) from
    * the per-item `"status": <n>` fields (< 300 = success — the same
    * test `elasticsearch.helpers` applies). A body without items (or a
    * non-JSON body from a permissive proxy) counts as all-success with
    * `"errors":true` absent, matching the lenient reference flow. */
  def tally(body: String): (Int, Int) = {
    val status = """"status"\s*:\s*(\d+)""".r
    val codes = status.findAllMatchIn(body).map(_.group(1).toInt).toSeq
    (codes.count(_ < 300), codes.count(_ >= 300))
  }

  private[sources] def log(resource: String, chunkId: String,
      ok: Int, failed: Int): Unit =
    if (failed > 0)
      System.err.println(s"[es-bulk] $resource/$chunkId: $failed " +
        s"document(s) failed to index, $ok succeeded")
}

/** Test double: each payload lands as `<dir>/part-<p>-<seq>.ndjson`,
  * written to a temp name and renamed — atomic and idempotent under
  * retry (same chunkId → same final name, byte-identical content). */
final class FileBulkTransport(dirPath: String) extends BulkTransport {
  // Path is not Serializable; the transport ships inside the writer
  // factory, so hold the String and resolve per send
  override def send(resource: String, chunkId: String,
      payload: Array[Byte]): Unit = {
    val dir = Paths.get(dirPath)
    Files.createDirectories(dir)
    val tmp = dir.resolve(s".$chunkId.${Thread.currentThread().getId}.tmp")
    Files.write(tmp, payload)
    Files.move(tmp, dir.resolve(s"$chunkId.ndjson"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }
}
