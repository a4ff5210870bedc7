package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time-correct feature computation — the feature-store
  * primitive (Feast/Tecton "point-in-time join"): for every LABEL row,
  * aggregates over carrier events STRICTLY BEFORE the label's
  * timestamp. Strictness is the leakage guard: a feature computed from
  * a same-instant event is information the model would not have had at
  * serving time, the classic way training sets silently cheat.
  *
  * Mechanics: carriers and probes union into one per-key stream ordered
  * by (time, tag) with probes tagged BEFORE carriers at equal time, so
  * a running aggregate "up to the current row" sees exactly the
  * carriers from strictly earlier instants. ONE shuffle on the entity
  * key, one per-key ordered pass — the as-of-join shape, never a
  * per-label lookup or a time-range self-join.
  * At 100 TB the window is partitioned by the entity key (bounded by
  * per-entity history, parallel across entities). */
object PointInTime {

  /** For each probe: running count / sum(value) / latest-carrier-time
    * over carriers strictly before `probeTime` (seconds). `probes`
    * must carry a unique `label_id`. Returns (label_id, {prefix}_n,
    * {prefix}_sum, {prefix}_last_s). */
  def strictPriorStats(probes: DataFrame, carriers: DataFrame,
      keyCol: String, probeTime: String, carrierTime: String,
      valueCol: Option[String], prefix: String): DataFrame = {
    val p = probes.select(col(keyCol).as("k"),
      col(probeTime).as("s"), lit(0).as("tag"), col("label_id"),
      lit(null).cast("double").as("v"))
    val c = carriers.select(col(keyCol).as("k"),
      col(carrierTime).as("s"), lit(1).as("tag"),
      lit(null).cast(probes.schema("label_id").dataType).as("label_id"),
      valueCol.map(col(_).cast("double"))
        .getOrElse(lit(0.0)).as("v"))
    val w = Window.partitionBy("k")
      .orderBy(col("s").asc, col("tag").asc, col("label_id").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    c.unionByName(p)
      .withColumn("n", sum(when(col("tag") === 1, 1L).otherwise(0L))
        .over(w))
      .withColumn("sv", sum(when(col("tag") === 1, col("v"))).over(w))
      .withColumn("lastc", max(when(col("tag") === 1, col("s"))).over(w))
      .filter(col("tag") === 0)
      .select(col("label_id"), col("n").as(s"${prefix}_n"),
        col("sv").as(s"${prefix}_sum"), col("lastc").as(s"${prefix}_last_s"))
  }
}
