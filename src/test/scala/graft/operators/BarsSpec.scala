package graft.operators

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.streaming.StreamIngest

class BarsSpec extends SparkSpec {
  import spark.implicits._

  test("open/close pick the ts-first/ts-last value with id tiebreak") {
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:01")
    val ts1 = java.sql.Timestamp.valueOf("2024-01-01 10:30:00")
    val events = Seq(
      (1L, ts0, "a", 5.0),
      (2L, ts0, "a", 7.0),   // same ts as id 1 → id decides open
      (3L, ts1, "a", 2.0),
      (4L, ts1, "a", 9.0)    // same ts as id 3 → id decides close
    ).toDF("event_id", "ts", "event_type", "value")
    val bar = Bars.ohlc(events, "event_type", "ts", "event_id", "value",
      3600000000L).head()
    assert(bar.getAs[Double]("open") == 5.0, "open = lowest id at min ts")
    assert(bar.getAs[Double]("close") == 9.0, "close = highest id at max ts")
    assert(bar.getAs[Double]("high") == 9.0)
    assert(bar.getAs[Double]("low") == 2.0)
    assert(bar.getAs[Long]("n_events") == 4L)
    assert(bar.getAs[Double]("volume") == 23.0)
  }

  test("plan: single aggregate, no window over the event stream") {
    val events = graft.Tables.events(spark, SfDir)
    val plan = Bars.ohlc(events, "event_type", "ts", "event_id", "value",
      3600000000L).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"OHLC must be a k=1-bounded aggregate, not a window:\n$plan")
  }

  test("streaming twin agrees with batch on closed windows") {
    val events = graft.Tables.events(spark, SfDir)
    val evDir = Files.createTempDirectory("bars_stream")
    Files.copy(Paths.get(s"$SfDir/events.parquet"),
      evDir.resolve("events.parquet"))
    val raw = StreamIngest.parquetStream(spark, evDir.toString,
      spark.read.parquet(s"$SfDir/events.parquet").schema)
    val evStream = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ => raw.withColumn("ts", col("ts").cast("timestamp"))
    }
    val q = StreamIngest.ohlcStream(evStream, "event_type", "ts",
        "event_id", "value")
      .writeStream.format("memory").queryName("bars_out")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.sql(
      """SELECT window_start, event_type, open, high, low, close,
        |  n_events, volume FROM bars_out""".stripMargin)
      .collect().map(_.toSeq).toSet
    assert(streamed.nonEmpty, "watermark must close at least one window")
    // batch reference on the same hourly buckets
    val batch = Bars.ohlc(events, "event_type", "ts", "event_id",
        "value", 3600000000L)
      .withColumn("window_start",
        expr("timestamp_micros(bar * 3600000000)"))
      .select("window_start", "event_type", "open", "high", "low",
        "close", "n_events", "volume")
      .collect().map(_.toSeq).toSet
    // every closed streamed window must equal its batch bar exactly
    assert(streamed.subsetOf(batch),
      s"streamed bars diverge from batch: ${streamed.diff(batch).take(3)}")
  }
}
