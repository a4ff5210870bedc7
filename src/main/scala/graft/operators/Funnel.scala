package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered funnel analysis over an event stream: how many users reached
  * step k having done steps 1..k-1 in order (view → click → purchase).
  *
  * Shape: one min-timestamp aggregate per step, each joined to the
  * previous step's cohort — k small aggregates on the same (user) key
  * instead of a per-user sort window, so every stage partial-aggregates
  * map-side and the join key never changes (at scale the exchanges
  * reuse). Timestamps compare at second precision — both engines
  * truncate identically (sub-second fixture noise must not flip a
  * strict '>' between them).
  */
object Funnel {

  def funnelCounts(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val sec = unix_timestamp(date_trunc("second", col(tsCol)))
    def stepEvents(t: String) =
      events.filter(col(typeCol) === t)
        .select(col(userCol).as("user_id"), sec.as("s"))

    val cohorts = steps.tail.zipWithIndex
      .scanLeft(stepEvents(steps.head).groupBy("user_id")
        .agg(min(col("s")).as("t"))) { case (prev, (t, _)) =>
        stepEvents(t)
          .join(prev, Seq("user_id"))
          .filter(col("s") > col("t"))
          .groupBy("user_id")
          .agg(min(col("s")).as("t"))
      }

    cohorts.zip(steps).zipWithIndex.map { case ((c, name), i) =>
      c.agg(count(lit(1)).as("n_users"))
        .select(lit(f"step${i + 1}%d_$name").as("step"),
          col("n_users").cast("long").as("n_users"))
    }.reduce(_.unionByName(_)).orderBy("step")
  }
}
