package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Trailing-window feature computation — the feature-store staple
  * ("7-day spend", "30-day event count") built leakage-free: each day's
  * features see only that day and earlier, so a training join at day d
  * (see [[PointInTime]]) can never peek forward.
  *
  * Scale shape: raw events first collapse to a per-(entity, day) grid
  * via ONE partial-aggregated groupBy — the trailing window then runs
  * over the grid, partitioned BY ENTITY with a RANGE frame on the
  * epoch-day number. Millions of independent entity partitions, each
  * holding a few hundred grid rows — the window never sees raw events
  * and never partitions on a low-cardinality column. Day sums
  * accumulate as DECIMAL(18,4) so the rolling sums (and their ratios)
  * are exact and identical across engines.
  */
object RollingFeatures {

  /** Per-(key, observed day) trailing features over the last
    * `windowDays` days (inclusive): rolling sum / event count / mean.
    * Days with no events don't emit rows (join against a gap-filled
    * grid — [[GapFill.forwardFillDaily]] — when a dense frame is
    * needed); the RANGE frame still spans true calendar days, so gaps
    * age out of the window correctly. */
  def trailingDaily(events: DataFrame, keyCol: String, tsCol: String,
      valCol: String, windowDays: Int = 7): DataFrame = {
    val daily = events
      .select(col(keyCol).as("k"), to_date(col(tsCol)).as("day"),
        col(valCol).cast(DecimalType(18, 4)).as("v"))
      .groupBy("k", "day")
      .agg(sum(col("v")).as("day_sum"), count(col("v")).as("day_n"))
      .withColumn("day_num", datediff(col("day"), lit("1970-01-01")))

    val w = Window.partitionBy("k").orderBy(col("day_num"))
      .rangeBetween(-(windowDays - 1).toLong, 0L)
    daily.select(col("k"), col("day"),
      col("day_sum").cast("double").as("day_sum"),
      col("day_n"),
      sum(col("day_sum")).over(w).cast("double").as("roll_sum"),
      sum(col("day_n")).over(w).as("roll_n"),
      round(sum(col("day_sum")).over(w).cast("double") /
        sum(col("day_n")).over(w), 6).as("roll_avg"))
  }
}
