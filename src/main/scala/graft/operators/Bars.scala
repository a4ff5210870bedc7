package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Time-bar (OHLC) aggregation — the downsampling shape every
  * event/metric store serves (candlesticks, per-window sensor rollups,
  * rate summaries): for each (key, time bucket), the first / highest /
  * lowest / last value plus count and volume.
  *
  * Scale shape: ONE partial-aggregated groupBy. Open and close are
  * `min(struct(ts, id, value))` / `max(struct(ts, id, value))` — the
  * k=1 degenerate of the repo's k-bounded-aggregate discipline (q159
  * top_hits): an algebraic aggregate with map-side combine, NEVER a
  * `row_number` window over the event stream (the oracle pays the
  * window; the engine does not). The unique event id inside the
  * struct makes first/last deterministic under timestamp ties. Money
  * math rides DECIMAL and casts back, so high/low/volume are
  * engine-exact. */
object Bars {

  /** Per-(key, bucket) OHLC bars. `bucketUs` is the bar width in
    * microseconds (3600000000L = hourly). */
  def ohlc(events: DataFrame, keyCol: String, tsCol: String,
      idCol: String, valueCol: String, bucketUs: Long): DataFrame = {
    require(bucketUs > 0, "bar width must be positive")
    val d = col(valueCol).cast(DecimalType(18, 4))
    val first = min(struct(col(tsCol).as("t"), col(idCol).as("i"),
      d.as("v")))
    val last  = max(struct(col(tsCol).as("t"), col(idCol).as("i"),
      d.as("v")))
    events
      .groupBy(col(keyCol),
        expr(s"unix_micros($tsCol) div $bucketUs").as("bar"))
      .agg(
        first.getField("v").cast("double").as("open"),
        max(d).cast("double").as("high"),
        min(d).cast("double").as("low"),
        last.getField("v").cast("double").as("close"),
        count(lit(1)).as("n_events"),
        sum(d).cast("double").as("volume"))
  }
}
