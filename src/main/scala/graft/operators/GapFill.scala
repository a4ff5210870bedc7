package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series densify + forward-fill — the resample step feature
  * pipelines run before any rolling computation: event streams are
  * irregular, but models consume a value per (key, calendar day), with
  * gaps carrying the last observation forward (ffill).
  *
  * Scale shape: everything partitions by the ENTITY key — the per-day
  * pick is a (key, day) hash-aggregate via `max_by`-style struct max,
  * the calendar grid is a per-key `sequence` explode (span-bounded, no
  * cross join against a global calendar), and the fill is a window
  * PARTITIONED BY key — millions of independent partitions, the
  * opposite of the low-cardinality window the token-budget fix removed.
  * A key's partition holds its day span, not the corpus.
  */
object GapFill {

  /** One row per (key, day) over each key's [min(ts), max(ts)] span:
    * `v` = the day's LAST observation (latest ts, ties to highest id),
    * `v_filled` = v with gaps forward-filled, `is_gap` marking filled
    * days. */
  def forwardFillDaily(events: DataFrame, keyCol: String, tsCol: String,
      idCol: String, valCol: String): DataFrame = {
    // last observation of each (key, day): max over a (ts, id, value)
    // struct — one hash-aggregate, deterministic tie-break, no window
    val daily = events
      .select(col(keyCol).as("k"), to_date(col(tsCol)).as("day"),
        struct(col(tsCol), col(idCol), col(valCol).as("v")).as("obs"))
      .groupBy("k", "day")
      .agg(max(col("obs")).getField("v").as("v"))

    // per-key calendar grid: sequence() spans only the key's own range
    val grid = daily
      .groupBy("k")
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("k"),
        explode(sequence(col("d0"), col("d1"),
          expr("interval 1 day"))).as("day"))

    val w = Window.partitionBy("k").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .join(daily, Seq("k", "day"), "left")
      .select(col("k"), col("day"), col("v"),
        last(col("v"), ignoreNulls = true).over(w).as("v_filled"),
        col("v").isNull.as("is_gap"))
  }
}
