package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Exact decision-stump training (depth-1 CART): the best binary
  * split x ≤ v of a numeric feature by information gain, searched
  * over EVERY distinct value — the auditable baseline every deeper
  * tree must beat, and the single-feature screen ("is this feature
  * worth anything?") that runs before expensive model training.
  *
  * Scale shape: the corpus reduces to the (value, pos, tot) grid in
  * one partial-agg groupBy; cumulative class counts come from the
  * bucketed prefix (quantileDisc's machinery — no corpus-wide
  * window); the gain is evaluated per GRID row. All counts are exact
  * LONG; the gain is one deterministic x·ln x expression per row,
  * rounded to 9 dp so the argmax (gain desc, value asc) compares
  * DECIMALs exactly. */
object Stump {

  /** Best split of `xCol` against boolean `isPos`. Returns one row
    * (split_value, n_left, pos_left, n_right, pos_right, info_gain) —
    * info_gain in nats; the all-left split (v = max) is excluded. */
  def bestSplit(df: DataFrame, xCol: String, isPos: Column,
      nBuckets: Int = 1024): DataFrame = {
    val perValue = df
      .select(col(xCol).cast("double").as("v"), isPos.as("__y"))
      .groupBy("v")
      .agg(sum(when(col("__y"), 1L).otherwise(0L)).as("p_v"),
        count(lit(1)).as("n_v"))
    val bounds = broadcast(perValue
      .agg(min("v").as("__lo"), max("v").as("__hi"),
        sum("p_v").as("bigP"), sum("n_v").as("bigN")))
    val withB = perValue.crossJoin(bounds)
      .withColumn("__b",
        when(col("__hi") === col("__lo"), lit(0))
          .otherwise(least(lit(nBuckets - 1),
            floor((col("v") - col("__lo"))
              / (col("__hi") - col("__lo")) * nBuckets).cast("int"))))
    val wGrid = Window.orderBy(col("__b").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefixes = withB.groupBy("__b")
      .agg(sum("n_v").as("__bn"), sum("p_v").as("__bp"))
      .withColumn("__pren", coalesce(sum("__bn").over(wGrid), lit(0L)))
      .withColumn("__prep", coalesce(sum("__bp").over(wGrid), lit(0L)))
      .select(col("__b"), col("__pren"), col("__prep"))
    val wLocal = Window.partitionBy("__b").orderBy(col("v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = withB.join(broadcast(prefixes), "__b")
      .withColumn("nL", col("__pren") + sum("n_v").over(wLocal))
      .withColumn("pL", col("__prep") + sum("p_v").over(wLocal))
      .filter(col("nL") < col("bigN")) // all-left split carries no info

    def xlx(k: Column) = when(k > 0L,
      k.cast("double") * log(k.cast("double"))).otherwise(lit(0.0))

    val nR = col("bigN") - col("nL")
    val pR = col("bigP") - col("pL")
    // N·gain = N·H(parent) − [nL·H(L) + nR·H(R)], all via x·ln x
    val igN = (xlx(col("bigN")) - xlx(col("bigP"))
      - xlx(col("bigN") - col("bigP"))) -
      (xlx(col("nL")) - xlx(col("pL")) - xlx(col("nL") - col("pL"))) -
      (xlx(nR) - xlx(pR) - xlx(nR - pR))
    cum
      .select(col("v"), col("nL"), col("pL"), nR.as("nR"), pR.as("pR"),
        round(igN / col("bigN").cast("double"), 9)
          .cast(DecimalType(28, 9)).as("ig"))
      .groupBy()
      .agg(max(struct(col("ig"), (-col("v")).as("nv"), col("v").as("sv"),
        col("nL").as("a"), col("pL").as("b"), col("nR").as("c"),
        col("pR").as("d"))).as("m"))
      .select(col("m.sv").as("split_value"),
        col("m.a").as("n_left"), col("m.b").as("pos_left"),
        col("m.c").as("n_right"), col("m.d").as("pos_right"),
        round(col("m.ig").cast("double"), 6).as("info_gain"))
  }
}
