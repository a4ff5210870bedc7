package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Multi-touch revenue attribution — the model FAMILY beside q175's
  * single last-touch rule: first-touch, linear, and U-shaped
  * (position-based 40/20/40) credit for every (purchase, prior-touch)
  * pair, reported as revenue per touch channel under each model side
  * by side. Seeing the models disagree is the point: channel-budget
  * decisions that flip across rules are artifacts, not signal.
  *
  * Scale shape: the pair relation joins purchases to SAME-USER prior
  * touches — bounded by per-user history length, shuffled once on the
  * user key; per-purchase ranks window over purchase-id partitions
  * (purchase-keyed, high cardinality — never a corpus window). Credit
  * ratios are identical double expressions; credit × revenue rounds
  * to 6 dp and sums in DECIMAL per channel.
  */
object Attribution {

  /** Returns (touch_type, n_credited_purchases, rev_first, rev_linear,
    * rev_ushaped) ordered by touch_type. Purchases with no prior touch
    * carry no attributable revenue here (q175's 'none' bucket owns
    * that mass). */
  def models(events: DataFrame, touchTypes: Seq[String]): DataFrame = {
    val ev = events.withColumn("ts", date_trunc("second", col("ts")))
    val touches = ev.filter(col("event_type").isin(touchTypes: _*))
      .select(col("user_id"), col("ts").as("tts"),
        col("event_id").as("tid"), col("event_type").as("touch_type"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("pts"),
        col("event_id").as("pid"),
        col("value").cast(DecimalType(18, 4)).as("rev"))
    val pairs = purchases.join(touches, "user_id")
      .filter(col("tts") < col("pts"))
    val wOrd = Window.partitionBy("pid").orderBy(col("tts"), col("tid"))
    val wAll = Window.partitionBy("pid")
    val ranked = pairs
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("n", count(lit(1)).over(wAll))

    val cFirst = when(col("rn") === 1, lit(1.0)).otherwise(lit(0.0))
    val cLinear = lit(1.0) / col("n").cast("double")
    val cU = when(col("n") === 1, lit(1.0))
      .when(col("n") === 2, lit(0.5))
      .when(col("rn") === 1 || col("rn") === col("n"), lit(0.4))
      .otherwise(lit(0.2) / (col("n").cast("double") - 2.0))

    def credited(c: org.apache.spark.sql.Column) =
      round(col("rev").cast("double") * c, 6).cast(DecimalType(28, 6))

    ranked
      .select(col("touch_type"), col("pid"),
        credited(cFirst).as("cf"), credited(cLinear).as("cl"),
        credited(cU).as("cu"))
      .groupBy("touch_type")
      .agg(countDistinct(col("pid")).as("n_credited_purchases"),
        round(sum(col("cf")).cast("double"), 2).as("rev_first"),
        round(sum(col("cl")).cast("double"), 2).as("rev_linear"),
        round(sum(col("cu")).cast("double"), 2).as("rev_ushaped"))
      .orderBy("touch_type")
  }
}
