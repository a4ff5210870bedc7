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

  test("eventCountsByWindow over a streamed events fixture matches batch") {
    val events = Tables.events(spark, SfDir) // also sets nanosAsLong conf
    // the file-stream source wants a directory, not a single file
    val evDir = Files.createTempDirectory("ev_stream")
    Files.copy(Paths.get(s"$SfDir/events.parquet"),
      evDir.resolve("events.parquet"))
    val evStream = StreamIngest.parquetStream(spark, evDir.toString,
      spark.read.parquet(s"$SfDir/events.parquet").schema)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
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
}
