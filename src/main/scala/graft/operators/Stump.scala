package graft.operators

import graft.operators.Ckpt.CkptOps
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

  /** Gradient-boosted REGRESSION stumps under squared loss: `rounds`
    * sequential depth-1 fits, each on the residuals of the additive
    * model so far — the smallest real boosting machine, engine-exact.
    * Per round: one grid aggregation (value → n, Σr, Σr²), bucketed
    * prefix cumulatives, best split by max(S_L²/n_L + S_R²/n_R)
    * (6-dp-decimal score, value-asc tiebreak), leaf values = 6-dp
    * ROUNDED residual means (the frozen literals the next round's
    * residuals subtract — the [[KMeans]]/IRLS bounded-state
    * discipline: only 3 doubles per round reach the driver).
    *
    * Exactness: residuals are exact-decimal y minus 6-dp literal
    * leaves → bit-identical doubles; round(r, 6) is boundary-free
    * (r's true value IS a 6-dp decimal), and round(r², 6) is too —
    * r²·10¹² ≡ 500000 (mod 10⁶) would need a² ≡ 32 (mod 64), which
    * has no solutions, so no r² sits on a 6-dp half boundary.
    * Returns one row per round (round, split_value, mean_left,
    * mean_right, sse_before) — sse_before shrinking across rounds IS
    * the boosting effect. */
  def boostedSseStumps(df: DataFrame, xCol: String, yCol: String,
      rounds: Int = 2, nBuckets: Int = 1024,
      maxDriverGrid: Int = 65536): DataFrame = {
    require(rounds >= 1)
    val spark = df.sparkSession
    import spark.implicits._
    val d286 = DecimalType(28, 6)
    // lazy: the first round's grid collect materializes it; rounds are
    // sequential, so nothing races the checkpoint
    val base = df.select(col(xCol).cast("double").as("x"),
      col(yCol).cast("double").as("y")).graftCheckpoint(false)

    var pred: Column = lit(0.0)
    val rows = (1 to rounds).map { rd =>
      val r = col("y") - pred
      val perValue = base
        .select(col("x").as("v"), round(r, 6).cast(d286).as("__r"),
          round(r * r, 6).cast(d286).as("__q"))
        .groupBy("v")
        .agg(count(lit(1)).as("n_v"), sum(col("__r")).as("s_v"),
          sum(col("__q")).as("q_v"))
      // the per-VALUE grid is the whole remaining state; when it fits
      // the driver guard, split selection is exact local algebra on
      // the collected grid — one scheduled job per round. Identical
      // decimal/double ops as the distributed branch below (sums are
      // BigDecimal-exact in any order, score ops replayed in the same
      // IEEE order), so the selected split is bit-equal.
      val gridRows = perValue.limit(maxDriverGrid + 1).collect()
      val best: (Double, Double, Double, Double, Double, Double) =
        if (gridRows.length <= maxDriverGrid) {
          val g = gridRows.map(row => (row.getDouble(0), row.getLong(1),
            row.getDecimal(2), row.getDecimal(3))).sortBy(_._1)
          val bigN = g.iterator.map(_._2).sum
          val bigS = g.iterator.map(_._3)
            .foldLeft(java.math.BigDecimal.ZERO)(_.add(_))
          val bigQ = g.iterator.map(_._4)
            .foldLeft(java.math.BigDecimal.ZERO)(_.add(_))
          var nL = 0L
          var sL = java.math.BigDecimal.ZERO
          var bestKey: (java.math.BigDecimal, Double) = null
          var bestVal: (Double, Double, Double, Double, Double, Double) = null
          g.foreach { case (v, nv, sv, _) =>
            nL += nv; sL = sL.add(sv)
            if (nL < bigN) {
              val sLd = sL.doubleValue
              val sRd = bigS.doubleValue - sLd
              val nLd = nL.toDouble
              val nRd = (bigN - nL).toDouble
              val score = sLd * sLd / nLd + sRd * sRd / nRd
              val sc = java.math.BigDecimal.valueOf(score)
                .setScale(6, java.math.RoundingMode.HALF_UP)
              val key = (sc, -v)
              val better = bestKey == null || {
                val c = sc.compareTo(bestKey._1)
                c > 0 || (c == 0 && -v > bestKey._2)
              }
              if (better) {
                bestKey = key
                bestVal = (v, sLd, nLd, sRd, nRd, bigQ.doubleValue)
              }
            }
          }
          require(bestVal != null, "no splittable value grid")
          bestVal
        } else {
          // distributed fallback: bucketed prefix over the value grid
          val bounds = broadcast(perValue
            .agg(min("v").as("__lo"), max("v").as("__hi"),
              sum("n_v").as("bigN"), sum("s_v").as("bigS"),
              sum("q_v").as("bigQ")))
          val withB = perValue.crossJoin(bounds)
            .withColumn("__b",
              when(col("__hi") === col("__lo"), lit(0))
                .otherwise(least(lit(nBuckets - 1),
                  floor((col("v") - col("__lo"))
                    / (col("__hi") - col("__lo")) * nBuckets).cast("int"))))
          val wGrid = Window.orderBy(col("__b").asc)
            .rowsBetween(Window.unboundedPreceding, -1)
          val prefixes = withB.groupBy("__b")
            .agg(sum("n_v").as("__bn"), sum("s_v").as("__bs"))
            .withColumn("__pren", coalesce(sum("__bn").over(wGrid), lit(0L)))
            .withColumn("__pres", sum("__bs").over(wGrid))
            .select(col("__b"), col("__pren"), col("__pres"))
          val wLocal = Window.partitionBy("__b").orderBy(col("v").asc)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
          val cum = withB.join(broadcast(prefixes), "__b")
            .withColumn("nL", col("__pren") + sum("n_v").over(wLocal))
            .withColumn("sL", coalesce(col("__pres"),
              lit(0).cast(d286)) + sum("s_v").over(wLocal))
            .filter(col("nL") < col("bigN"))
          val sL = col("sL").cast("double")
          val sR = col("bigS").cast("double") - sL
          val nLd = col("nL").cast("double")
          val nRd = (col("bigN") - col("nL")).cast("double")
          val score = sL * sL / nLd + sR * sR / nRd
          val b = cum
            .select(col("v"), col("nL"), col("bigN"), col("bigQ"),
              sL.as("dsL"), sR.as("dsR"), nLd.as("dnL"), nRd.as("dnR"),
              round(score, 6).cast(d286).as("sc"))
            .groupBy()
            .agg(max(struct(col("sc"), (-col("v")).as("nv"),
              col("v").as("sv"), col("dsL").as("a"), col("dnL").as("b"),
              col("dsR").as("c"), col("dnR").as("d"),
              col("bigQ").as("q"))).as("m"))
            .select(col("m.sv"), col("m.a"), col("m.b"), col("m.c"),
              col("m.d"), col("m.q").cast("double").as("q"))
            .collect().head
          (b.getDouble(0), b.getDouble(1), b.getDouble(2),
            b.getDouble(3), b.getDouble(4), b.getDouble(5))
        }
      def r6(v: Double) = BigDecimal(v)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val (split, dsL, dnL, dsR, dnR, q) = best
      val lm = r6(dsL / dnL)
      val rm = r6(dsR / dnR)
      val sseBefore = r6(q)
      pred = pred + when(col("x") <= lit(split), lit(lm))
        .otherwise(lit(rm))
      (rd, split, lm, rm, sseBefore)
    }
    rows.toDF("round", "split_value", "mean_left", "mean_right",
      "sse_before").orderBy("round")
  }
}
