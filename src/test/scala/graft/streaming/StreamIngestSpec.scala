package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables
import graft.embed.DeterministicEmbedder

class StreamIngestSpec extends SparkSpec {

  test("watchFolder: AvailableNow drains backlog, restart is incremental (S2)") {
    val in  = Files.createTempDirectory("stream_in").toString
    val out = Files.createTempDirectory("stream_out").toString
    val ckp = Files.createTempDirectory("stream_ckp").toString
    Files.createDirectories(Paths.get(in, "catA"))
    Files.write(Paths.get(in, "catA/d1.txt"), "p1\fp2".getBytes)

    val q1 = StreamIngest.watchFolder(spark, in, out, ckp,
      DeterministicEmbedder(16), glob = "*.txt")
    q1.awaitTermination(60000)
    assert(spark.read.parquet(out).count() === 2)

    // new file arrives; restart processes ONLY it (checkpointed source)
    Files.write(Paths.get(in, "catA/d2.txt"), "p3".getBytes)
    val q2 = StreamIngest.watchFolder(spark, in, out, ckp,
      DeterministicEmbedder(16), glob = "*.txt")
    q2.awaitTermination(60000)
    val back = spark.read.parquet(out)
    assert(back.count() === 3)
    assert(back.filter(col("lv1_cat") === "catA").count() === 3)
  }

  test("indexPipeline: stream batches fold into a queryable search index") {
    val in  = Files.createTempDirectory("idx_in").toString
    val idx = Files.createTempDirectory("idx_out").toString + "/index"
    val ckp = Files.createTempDirectory("idx_ckp").toString
    Files.createDirectories(Paths.get(in, "catA"))
    Files.write(Paths.get(in, "catA/alpha.txt"),
      "grumpy wizards make toxic brew".getBytes)
    val emb = DeterministicEmbedder(16)

    val q1 = StreamIngest.indexPipeline(spark, in, idx, ckp, emb,
      glob = "*.txt")
    q1.awaitTermination(60000)
    val hit1 = graft.index.SearchIndex.bm25(spark, idx, "wizards").collect()
    assert(hit1.length === 1)

    // a later file is folded in incrementally and becomes searchable;
    // the first doc's results are unchanged. compactEvery=1 exercises
    // the in-pipeline maintenance hook: buckets stay one file each.
    Files.write(Paths.get(in, "catA/beta.txt"),
      "calm librarians shelve quiet books".getBytes)
    val q2 = StreamIngest.indexPipeline(spark, in, idx, ckp, emb,
      glob = "*.txt", compactEvery = 1)
    q2.awaitTermination(60000)
    val maxFiles = Files.list(Paths.get(idx, "postings")).toArray
      .map(_.asInstanceOf[java.nio.file.Path])
      .filter(_.getFileName.toString.startsWith("term_bucket="))
      .map(p => Files.list(p).toArray.map(_.toString)
        .count(_.endsWith(".parquet"))).max
    assert(maxFiles === 1, "auto-compaction left fragmented buckets")
    assert(graft.index.SearchIndex.bm25(spark, idx, "librarians")
      .collect().length === 1)
    assert(graft.index.SearchIndex.bm25(spark, idx, "wizards")
      .collect().length === 1)
    // knn over the same index sees both pages
    val knn = graft.index.SearchIndex.knn(spark, idx,
      emb.embed("quiet books"), 2, dim = 16,
      probeHammingRadius = graft.index.SearchIndex.LshBits)
    assert(knn.collect().length === 2)
  }

  test("searchServe: streamed queries answered per micro-batch from the index") {
    import spark.implicits._
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val emb = DeterministicEmbedder(16)
    val idx = Files.createTempDirectory("serve_idx").toString + "/index"
    val docs = Seq((1L, "grumpy wizards make toxic brew"),
      (2L, "calm librarians shelve quiet books")).toDF("doc_id", "text")
    val we = graft.embed.BatchEmbed.withEmbedding(docs, "text", "embedding", emb)
    graft.index.SearchIndex.build(we.select("doc_id", "text"),
      we.select(col("doc_id").as("vec_id"), col("embedding")), idx,
      dim = emb.dim)

    val in = Files.createTempDirectory("serve_in").toString
    Seq((10L, "wizards brew"), (20L, "quiet librarians"))
      .toDF("query_id", "text").write.parquet(in + "/b0")
    val out = Files.createTempDirectory("serve_out").toString + "/results"
    val schema = StructType(Seq(StructField("query_id", LongType),
      StructField("text", StringType)))
    val q = StreamIngest.searchServe(
      StreamIngest.parquetStream(spark, in + "/b0", schema), idx, out,
      Files.createTempDirectory("serve_ckp").toString, emb, k = 2)
    q.awaitTermination(60000)

    val res = spark.read.parquet(out)
    // each query answered; rank-1 hits the right doc
    val top = res.filter(col("rank") === 1)
      .collect().map(r => r.getAs[Long]("query_id") ->
        r.getAs[Long]("doc_id")).toMap
    assert(top === Map(10L -> 1L, 20L -> 2L))
    assert(res.columns.contains("batch_id"))
  }

  test("percolatePipeline: standing queries alert per micro-batch") {
    import spark.implicits._
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val in = Files.createTempDirectory("perc_in").toString
    Seq((1L, "spark window functions"), (2L, "nothing relevant"),
      (3L, "spark alone")).toDF("doc_id", "text").write.parquet(in + "/b0")
    val out = Files.createTempDirectory("perc_out").toString + "/alerts"
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    val qs = Seq(100L -> "spark window", 200L -> "spark")
    val q = StreamIngest.percolatePipeline(
      StreamIngest.parquetStream(spark, in + "/b0", schema), qs, out,
      Files.createTempDirectory("perc_ckp").toString)
    q.awaitTermination(60000)
    val res = spark.read.parquet(out)
    assert(res.columns.contains("batch_id"))
    val got = res.select("doc_id", "query_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 100L), (1L, 200L), (3L, 200L)))
  }

  test("semDedupPipeline: cross-batch semantic dedup; replay admits nothing twice") {
    import spark.implicits._
    import org.apache.spark.sql.types.{ArrayType, FloatType, LongType, StructField, StructType}
    val e = DeterministicEmbedder(64)
    val in   = Files.createTempDirectory("sem_in").toString
    val kept = Files.createTempDirectory("sem_kept").toString + "/kept"
    val out  = Files.createTempDirectory("sem_dec").toString + "/decisions"
    val ckp  = Files.createTempDirectory("sem_ckp").toString
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val anchors = Seq(e.embed("alpha beta gamma"),
      e.embed("totally different thing"))
    def stream() = StreamIngest.parquetStream(spark, in, schema)

    Seq((1L, e.embed("alpha beta gamma").toSeq),
      (2L, e.embed("alpha beta gamma").toSeq),   // in-batch dup of 1
      (3L, e.embed("totally different thing").toSeq))
      .toDF("vec_id", "embedding").write.mode("append").parquet(in)
    StreamIngest.semDedupPipeline(stream(), anchors, 0.99, kept, out, ckp)
      .awaitTermination(60000)
    assert(spark.read.parquet(kept).collect().map(_.getLong(0)).toSet ===
      Set(1L, 3L))

    // next batch: 11 duplicates the KEPT corpus, 12/13 are a new group
    Seq((11L, e.embed("alpha beta gamma").toSeq),
      (12L, e.embed("third topic entirely new").toSeq),
      (13L, e.embed("third topic entirely new").toSeq))
      .toDF("vec_id", "embedding").write.mode("append").parquet(in)
    StreamIngest.semDedupPipeline(stream(), anchors, 0.99, kept, out, ckp)
      .awaitTermination(60000)
    assert(spark.read.parquet(kept).collect().map(_.getLong(0)).toSet ===
      Set(1L, 3L, 12L))
    val dec = spark.read.parquet(out).collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[Boolean]("dup_of_corpus"), r.getAs[Long]("cluster_id"),
          r.getAs[Boolean]("keep"))).toMap
    assert(dec(11L)._1 && !dec(11L)._3)           // corpus dup
    assert(dec(13L) === ((false, 12L, false)))    // in-batch dup of 12
    val nDecisions = spark.read.parquet(out).count()

    // fresh-checkpoint replay over the same inputs: the batch_id guard
    // skips decisions, the anti-join admits nothing twice
    StreamIngest.semDedupPipeline(stream(), anchors, 0.99, kept, out,
      Files.createTempDirectory("sem_ckp2").toString)
      .awaitTermination(60000)
    assert(spark.read.parquet(kept).collect().map(_.getLong(0)).toSet ===
      Set(1L, 3L, 12L))
    assert(spark.read.parquet(out).count() === nDecisions)
  }

  test("cdcIndexPipeline: insert/update/delete exactly-once; index ≡ rebuild per version") {
    import spark.implicits._
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val emb = DeterministicEmbedder(16)
    val idx = Files.createTempDirectory("cdc_idx").toString + "/index"

    val cat = graft.table.SnapshotCatalog(spark,
      Files.createTempDirectory("cdc_cat").toString)
    val v1 = Seq((1L, "grumpy wizards make toxic brew"),
      (2L, "calm librarians shelve quiet books"),
      (3L, "secret takedown target document")).toDF("doc_id", "text")
    cat.write("docs", v1)
    val v2 = Seq((1L, "grumpy wizards make toxic brew"),
      (2L, "calm librarians shelve loud books"), // updated
      (4L, "fresh crawl page about wizards")     // inserted; 3 deleted
    ).toDF("doc_id", "text")
    cat.write("docs", v2)

    // reference point: an index rebuilt from scratch over a version
    def rebuilt(df: org.apache.spark.sql.DataFrame): String = {
      val d = Files.createTempDirectory("cdc_reb").toString + "/index"
      val we = graft.embed.BatchEmbed.withEmbedding(df, "text", "embedding", emb)
      graft.index.SearchIndex.build(we.select("doc_id", "text"),
        we.select(col("doc_id").as("vec_id"), col("embedding")), d,
        dim = emb.dim)
      d
    }
    // full table-content comparison — stronger than comparing one query
    def tableSets(d: String) = (
      spark.read.parquet(s"$d/postings").select("term", "doc_id", "tf", "dl")
        .collect().map(_.toSeq).toSet,
      spark.read.parquet(s"$d/docfreq").select("term", "df")
        .collect().map(_.toSeq).toSet,
      spark.read.parquet(s"$d/stats").collect().map(_.toSeq).toSet,
      spark.read.parquet(s"$d/vectors").select("doc_id")
        .collect().map(_.toSeq).toSet)

    // batch 0: initial corpus arrives as inserts → index ≡ rebuild(v1)
    StreamIngest.applyCdcBatch(
      v1.withColumn("change", lit("inserted")), idx, emb)
    assert(tableSets(idx) === tableSets(rebuilt(v1)))

    // batch 1: the v1→v2 CDC diff through the real streaming path
    val in = Files.createTempDirectory("cdc_in").toString + "/b0"
    cat.diff("docs", 1L, 2L, "doc_id")
      .select("doc_id", "text", "change").write.parquet(in)
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType), StructField("change", StringType)))
    val q = StreamIngest.cdcIndexPipeline(
      StreamIngest.parquetStream(spark, in, schema), idx,
      Files.createTempDirectory("cdc_ckp").toString, emb)
    q.awaitTermination(60000)
    val want = tableSets(rebuilt(v2))
    assert(tableSets(idx) === want)
    // the deleted doc is unfindable through every leg
    assert(graft.index.SearchIndex.bm25(spark, idx, "takedown secret")
      .count() === 0)

    // replay the SAME batch (a restarted at-least-once sink): retract-
    // then-insert makes it a no-op — no double-add, no double-delete
    StreamIngest.applyCdcBatch(spark.read.parquet(in), idx, emb)
    assert(tableSets(idx) === want)
  }

  test("dedupStream: first writer wins per content hash") {
    val in = Files.createTempDirectory("dedup_in")
    import spark.implicits._
    Seq(
      (1L, "same text", java.sql.Timestamp.valueOf("2024-01-01 10:00:00")),
      (2L, "same text", java.sql.Timestamp.valueOf("2024-01-01 10:01:00")),
      (3L, "other text", java.sql.Timestamp.valueOf("2024-01-01 10:02:00"))
    ).toDF("doc_id", "text", "ts").write.parquet(in.toString + "/batch1")
    val stream = StreamIngest.parquetStream(spark, in.toString + "/batch1",
      spark.read.parquet(in.toString + "/batch1").schema)
    val q = StreamIngest.dedupStream(stream, "text", "ts")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val ids = spark.sql("SELECT doc_id FROM dedup_out ORDER BY doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(ids.size === 2)          // one of the dupes dropped
    assert(ids.contains(3L))        // unique doc kept
    assert(ids.intersect(Set(1L, 2L)).size === 1)
  }

  test("dedupAgainstCorpus: historical + in-stream duplicates both dropped") {
    val in = Files.createTempDirectory("cdedup_in")
    import spark.implicits._
    // historical corpus already contains "seen before"
    val corpus = Seq((100L, "seen before")).toDF("doc_id", "text")
    Seq(
      (1L, "seen before", java.sql.Timestamp.valueOf("2024-01-01 10:00:00")),
      (2L, "brand new", java.sql.Timestamp.valueOf("2024-01-01 10:01:00")),
      (3L, "brand new", java.sql.Timestamp.valueOf("2024-01-01 10:02:00")),
      (4L, "also new", java.sql.Timestamp.valueOf("2024-01-01 10:03:00"))
    ).toDF("doc_id", "text", "ts").write.parquet(in.toString + "/b1")
    val stream = StreamIngest.parquetStream(spark, in.toString + "/b1",
      spark.read.parquet(in.toString + "/b1").schema)
    val q = StreamIngest.dedupAgainstCorpus(stream, corpus, "text", "ts")
      .writeStream.format("memory").queryName("cdedup_out")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val ids = spark.sql("SELECT doc_id FROM cdedup_out")
      .collect().map(_.getLong(0)).toSet
    assert(!ids.contains(1L))                      // already in corpus
    assert(ids.contains(4L))                       // genuinely new
    assert(ids.intersect(Set(2L, 3L)).size === 1)  // in-stream dupe dropped
  }

  test("versionedSink: micro-batches become versions; replay never double-writes") {
    import spark.implicits._
    val root = Files.createTempDirectory("vsink")
    val in = root.toString + "/in"
    val ckpt = root.toString + "/ckpt"
    val cat = graft.table.SnapshotCatalog(spark, root.toString + "/cat")
    Seq((1L, "a"), (2L, "b")).toDF("id", "s").write.parquet(in)
    val schema = spark.read.parquet(in).schema
    val q1 = StreamIngest.versionedSink(
      StreamIngest.parquetStream(spark, in, schema), cat, "t", ckpt)
    q1.awaitTermination(60000)
    val v1 = cat.currentVersion("t").get
    assert(cat.read("t").count() === 2L)
    // restart with the SAME checkpoint and new input: only the new batch
    // commits; the old one is not replayed into a duplicate version
    Seq((3L, "c")).toDF("id", "s").write.mode("append").parquet(in)
    val q2 = StreamIngest.versionedSink(
      StreamIngest.parquetStream(spark, in, schema), cat, "t", ckpt)
    q2.awaitTermination(60000)
    assert(cat.read("t").count() === 1L) // append-mode batch = the delta
    assert(cat.versions("t").size === v1.toInt + 1)
    // simulated replay of an already-committed batch: pointer moves,
    // no new version, no rewrite
    val before = cat.versions("t")
    val replayed = cat.commitTagged("t",
      Seq((9L, "zz")).toDF("id", "s"), "batch=0")
    assert(replayed === 1L)              // resolves to the original commit
    assert(cat.versions("t") === before)
    assert(cat.readAt("t", replayed).as[(Long, String)].collect().toSet ===
      Set((1L, "a"), (2L, "b")))         // original data, not the replay's
  }

  test("watermark: a late event cannot re-open an already-emitted window") {
    import spark.implicits._
    val in = Files.createTempDirectory("late_in")
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    def write(dir: String, rows: (Long, java.sql.Timestamp, Double)*): Unit = {
      rows.toSeq.toDF("event_id", "ts", "value")
        .withColumn("event_type", lit("view"))
        .coalesce(1).write.parquet(in.toString + "/" + dir)
      Thread.sleep(1100) // distinct mtimes -> deterministic batch order
    }
    // b1 pushes the watermark to 11:15 (30 min delay); during b2 the
    // 10:00 window finalizes and emits; b3's 10:20 event is later than
    // the watermark AND its window is gone — it must not re-open it
    // (append mode emits each window exactly once).
    write("b1", (1L, ts("2024-01-01 10:15:00"), 1.0),
      (2L, ts("2024-01-01 11:45:00"), 1.0))
    write("b2", (3L, ts("2024-01-01 12:30:00"), 1.0))
    write("b3", (4L, ts("2024-01-01 10:20:00"), 1.0)) // LATE
    val schema = spark.read.parquet(in.toString + "/b1").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1") // one file per micro-batch:
      .parquet(in.toString + "/*")       // watermark advances between them
    val q = StreamIngest.eventCountsByWindow(stream,
      windowLen = "1 hour", watermark = "30 minutes")
      .writeStream.format("memory").queryName("late_out")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val w10 = spark.sql(
      """SELECT n_events FROM late_out
        |WHERE window_start = timestamp'2024-01-01 10:00:00'""".stripMargin)
      .collect().map(_.getLong(0))
    // exactly ONE emission of the 10:00 window, without the late event
    assert(w10.toSeq === Seq(1L))
  }

  test("correlateOuter: unmatched clicks emit null once the watermark closes them") {
    val in = Files.createTempDirectory("corro_in")
    import spark.implicits._
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    Seq((1L, ts("2024-01-01 10:00:00"), 100L, 0.0),
      (2L, ts("2024-01-01 10:00:00"), 101L, 0.0)) // user 2 never buys
      .toDF("user_id", "ts", "event_id", "value")
      .coalesce(1).write.parquet(in.toString + "/l/b1")
    Thread.sleep(1100)
    // sentinel batch pushes the watermark to 21:00 (2 h delay), proving
    // the 10:00 clicks' match windows closed → null rows may emit
    Seq((9L, ts("2024-01-01 23:00:00"), 999L, 0.0))
      .toDF("user_id", "ts", "event_id", "value")
      .coalesce(1).write.parquet(in.toString + "/l/b2")
    Thread.sleep(1100)
    // a third batch runs AFTER the watermark advanced — outer nulls are
    // flushed by the next trigger, not by the batch that moved the mark
    Seq((9L, ts("2024-01-01 23:30:00"), 998L, 0.0))
      .toDF("user_id", "ts", "event_id", "value")
      .coalesce(1).write.parquet(in.toString + "/l/b3")
    // the join watermark is the MIN across both streams — the right
    // side needs its own late sentinel or the left rows never close
    Seq((1L, ts("2024-01-01 10:30:00"), 200L, 9.5),
      (9L, ts("2024-01-01 23:00:00"), 997L, 0.0))
      .toDF("user_id", "ts", "event_id", "value")
      .write.parquet(in.toString + "/r")
    val schema = spark.read.parquet(in.toString + "/r").schema
    val l = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(in.toString + "/l/*")
    val q = StreamIngest.correlateOuter(l,
      StreamIngest.parquetStream(spark, in.toString + "/r", schema))
      .writeStream.format("memory").queryName("corro_out")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.sql("SELECT l_event, r_event FROM corro_out")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got(100L) === Some(200L))  // matched inside the window
    assert(got.get(101L) === Some(None)) // unmatched → null row emitted
  }

  test("runningUserStats: mapGroupsWithState accumulates per user") {
    val in = Files.createTempDirectory("stats_in")
    import spark.implicits._
    Seq(
      (10L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1.5),
      (10L, java.sql.Timestamp.valueOf("2024-01-01 11:00:00"), 2.5),
      (20L, java.sql.Timestamp.valueOf("2024-01-01 10:30:00"), 4.0)
    ).toDF("user_id", "ts", "value").write.parquet(in.toString + "/b")
    val stream = StreamIngest.parquetStream(spark, in.toString + "/b",
      spark.read.parquet(in.toString + "/b").schema)
    val q = StreamIngest.runningUserStats(stream)
      .writeStream.format("memory").queryName("user_stats")
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val m = spark.sql("SELECT user_id, n_events, sum_value FROM user_stats")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(m(10L) === ((2L, 4.0)))
    assert(m(20L) === ((1L, 4.0)))
  }

  test("correlate: stream-stream join within time bound matches batch join") {
    val in = Files.createTempDirectory("corr_in")
    import spark.implicits._
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val clicks = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L, 0.0),
      (2L, ts("2024-01-01 10:00:00"), 101L, 0.0))
      .toDF("user_id", "ts", "event_id", "value")
    val buys = Seq(
      (1L, ts("2024-01-01 10:30:00"), 200L, 9.5),  // within 1 h of click 100
      (1L, ts("2024-01-01 12:30:00"), 201L, 3.0),  // outside the bound
      (2L, ts("2024-01-01 09:30:00"), 202L, 1.0))  // before the click
      .toDF("user_id", "ts", "event_id", "value")
    clicks.write.parquet(in.toString + "/l")
    buys.write.parquet(in.toString + "/r")
    val schema = spark.read.parquet(in.toString + "/l").schema
    val q = StreamIngest.correlate(
      StreamIngest.parquetStream(spark, in.toString + "/l", schema),
      StreamIngest.parquetStream(spark, in.toString + "/r", schema))
      .writeStream.format("memory").queryName("corr_out")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.sql("SELECT l_event, r_event, r_value FROM corr_out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === Set((100L, 200L, 9.5)))
  }

  test("eventCountsByWindow over a streamed events fixture matches batch") {
    val events = Tables.events(spark, SfDir) // also sets nanosAsLong conf
    // the file-stream source wants a directory, not a single file
    val evDir = Files.createTempDirectory("ev_stream")
    Files.copy(Paths.get(s"$SfDir/events.parquet"),
      evDir.resolve("events.parquet"))
    val raw = StreamIngest.parquetStream(spark, evDir.toString,
      spark.read.parquet(s"$SfDir/events.parquet").schema)
    // mirror Tables.events: nanos generations surface ts as LONG (rebuild
    // micros), micros generations read as TIMESTAMP_NTZ (cast to LTZ)
    val evStream = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ => raw.withColumn("ts", col("ts").cast("timestamp"))
    }
    val agg = StreamIngest.eventCountsByWindow(evStream)
    val q = agg.writeStream.format("memory").queryName("ev_counts")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.sql(
      "SELECT sum(n_events) FROM ev_counts").head().getLong(0)
    val batch = events.count()
    // watermark in AvailableNow emits only windows closed by the final
    // watermark; the last (open) windows are withheld — so streamed is a
    // prefix of batch, with everything before the watermark included.
    assert(streamed > 0 && streamed <= batch)
    val perType = spark.sql(
      "SELECT event_type, sum(n_events) n FROM ev_counts GROUP BY event_type")
    assert(perType.count() > 0)
  }

  test("mvMaintainPipeline folds batches into a committed MV; replay is exactly-once") {
    val src = Files.createTempDirectory("mv_src")
    Files.copy(Paths.get(s"$SfDir/customer.parquet"),
      src.resolve("customer.parquet"))
    val catDir = Files.createTempDirectory("mv_cat").toString
    val schema = spark.read.parquet(s"$SfDir/customer.parquet").schema

    def run(ckp: String): Unit = {
      val stream = StreamIngest.parquetStream(spark, src.toString, schema)
      val q = StreamIngest.mvMaintainPipeline(stream, catDir, "mv",
        "c_mktsegment", "c_acctbal", ckp)
      q.awaitTermination(120000)
    }
    run(Files.createTempDirectory("mv_ckp1").toString)

    val cat = graft.table.SnapshotCatalog(spark, catDir)
    def canon = cat.read("mv")
      .select(col("c_mktsegment"), col("n_rows"),
        col("total").cast("double"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    val want = graft.table.MaterializedView.refresh(
        Tables.customer(spark, SfDir), "c_mktsegment", "c_acctbal")
      .select(col("c_mktsegment"), col("n_rows"),
        col("total").cast("double"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    assert(canon === want)

    // replay from a FRESH checkpoint (same batch ids): the tagged commit
    // re-points to the existing version — nothing double-counts
    run(Files.createTempDirectory("mv_ckp2").toString)
    assert(canon === want)
  }

  test("driftAlertPipeline: stable feed stays quiet, shifted feed alarms") {
    import graft.operators.Drift
    val events = Tables.events(spark, SfDir).select(col("value"))
    val (edges, props) = Drift.referenceProfile(events, "value")

    def score(df: org.apache.spark.sql.DataFrame): (Double, Boolean) = {
      val src = Files.createTempDirectory("drift_src")
      df.coalesce(1).write.mode("overwrite").parquet(src.toString)
      val out = Files.createTempDirectory("drift_out").toString
      val ckp = Files.createTempDirectory("drift_ckp").toString
      val stream = StreamIngest.parquetStream(spark, src.toString,
        spark.read.parquet(src.toString).schema)
      val q = StreamIngest.driftAlertPipeline(stream, "value", edges,
        props, psiBar = 0.25, out, ckp)
      q.awaitTermination(120000)
      val r = spark.read.parquet(out).head()
      (r.getAs[Double]("psi"), r.getAs[Boolean]("alarm"))
    }

    val (psiSame, alarmSame) = score(events)
    assert(!alarmSame && psiSame < 0.05, s"stable feed psi=$psiSame")
    val (psiShift, alarmShift) =
      score(events.select((col("value") * 3 + 500).as("value")))
    assert(alarmShift && psiShift > 0.25, s"shifted feed psi=$psiShift")
  }
}
