package graft.operators

import graft.operators.Ckpt.CkptOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Customer-base analytics: RFM segmentation (the classic
  * recency/frequency/monetary quartile cube) and cohort LTV curves
  * (cumulative revenue per acquisition cohort by month offset — the
  * revenue companion to q125's retention counts).
  *
  * Scale shapes: both reduce the order stream to ONE ROW PER CUSTOMER
  * with partial aggregates, then work on customer- or calendar²-scale
  * frames. RFM thresholds come from [[Ranks.quantileDisc]]'s exact
  * no-global-sort grid at binary-exact quartiles; scoring is integer
  * comparisons against broadcast thresholds. LTV's running sum windows
  * per cohort over month offsets — a calendar-bounded grid.
  */
object Customer {

  private val d184 = DecimalType(18, 4)

  /** RFM quartile segments: r_score/f_score/m_score ∈ 1..4 by the
    * .25/.5/.75 thresholds (score = 1 + #{thresholds strictly
    * exceeded}; note recency scores 1 for the MOST recent customers —
    * the raw quartile index, not a reversed "goodness"). Returns one
    * row per occupied cell: (r_score, f_score, m_score, n_customers,
    * revenue), ordered by the three scores. */
  def rfmSegments(orders: DataFrame, custCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    val dmax = broadcast(orders
      .agg(max(date_trunc("day", col(tsCol))).as("dmax")))
    val per = orders
      .groupBy(col(custCol).as("c"))
      .agg(max(date_trunc("day", col(tsCol))).as("dlast"),
        count(lit(1)).as("f"),
        sum(col(valueCol).cast(d184)).as("mdec"))
      .crossJoin(dmax)
      .select(col("c"),
        datediff(col("dmax"), col("dlast")).cast("int").as("r"),
        col("f"), col("mdec"))
      .graftCheckpoint(true) // customer-scale; feeds thresholds + scoring
    val labeled = per.select(lit("r").as("metric"),
        col("r").cast("double").as("mv"))
      .unionAll(per.select(lit("f").as("metric"),
        col("f").cast("double").as("mv")))
      .unionAll(per.select(lit("m").as("metric"),
        col("mdec").cast("double").as("mv")))
    val thAggs = Seq("r", "f", "m").flatMap { mName =>
      Seq(0.25 -> 1, 0.5 -> 2, 0.75 -> 3).map { case (p, i) =>
        max(when(col("metric") === mName && col("p") === p, col("value")))
          .as(s"${mName}q$i")
      }
    }
    val th = broadcast(
      Ranks.quantileDisc(labeled, "metric", "mv", Seq(0.25, 0.5, 0.75))
        .groupBy().agg(thAggs.head, thAggs.tail: _*))

    def score(v: org.apache.spark.sql.Column, pfx: String) =
      lit(1) + when(v > col(s"${pfx}q1"), 1).otherwise(0) +
        when(v > col(s"${pfx}q2"), 1).otherwise(0) +
        when(v > col(s"${pfx}q3"), 1).otherwise(0)

    per.crossJoin(th)
      .select(score(col("r").cast("double"), "r").as("r_score"),
        score(col("f").cast("double"), "f").as("f_score"),
        score(col("mdec").cast("double"), "m").as("m_score"),
        col("mdec"))
      .groupBy("r_score", "f_score", "m_score")
      .agg(count(lit(1)).as("n_customers"),
        round(sum(col("mdec")).cast("double"), 2).as("revenue"))
      .orderBy("r_score", "f_score", "m_score")
  }

  /** Cohort LTV: cumulative revenue per acquisition-month cohort by
    * month offset, absolute and per acquired customer. Returns
    * (cohort, offset, n_customers, cum_revenue, ltv) ordered by
    * (cohort, offset). */
  def cohortLtv(orders: DataFrame, custCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    val om = date_trunc("month", col(tsCol))
    val firstm = orders.groupBy(col(custCol).as("c"))
      .agg(min(om).as("cohort"))
    val sizes = firstm.groupBy("cohort")
      .agg(count(lit(1)).as("n_customers"))
    val rev = orders
      .join(firstm.withColumnRenamed("c", custCol), custCol)
      .groupBy(col("cohort"),
        months_between(om, col("cohort")).cast("int").as("offset"))
      .agg(sum(col(valueCol).cast(d184)).as("rev"))
    val w = Window.partitionBy("cohort").orderBy("offset")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rev.join(broadcast(sizes), "cohort")
      .withColumn("cum", sum(col("rev")).over(w)) // calendar² grid
      .select(col("cohort"), col("offset"), col("n_customers"),
        round(col("cum").cast("double"), 2).as("cum_revenue"),
        round(col("cum").cast("double")
          / col("n_customers").cast("double"), 6).as("ltv"))
      .orderBy("cohort", "offset")
  }

  /** ABC / Pareto classification: entities ranked by revenue
    * descending, classified A while the cumulative share stays ≤
    * `aCut` (‰), B up to `bCut` (‰), C beyond — the 80/95 inventory
    * rule. The global rank uses [[Ranks.globalRowNumber]]'s bucketed
    * machinery (id tiebreak on equal revenue) and the cumulative
    * revenue prefix rides RANK BLOCKS of 64 (never one task); both
    * the cumulative sums and the class-boundary comparisons
    * (cum·1000 ≤ cut·total) are exact DECIMAL arithmetic, so class
    * membership is engine-exact. Cuts are permille to keep the
    * boundary test integer. Returns (abc_class, n_entities, revenue,
    * share_ppm) ordered by class. */
  def abcClasses(df: DataFrame, entityCol: String, valueCol: String,
      aCutPermille: Int = 800, bCutPermille: Int = 950): DataFrame = {
    require(0 < aCutPermille && aCutPermille < bCutPermille
      && bCutPermille <= 1000)
    val perE = df.groupBy(col(entityCol).as("__id"))
      .agg(sum(col(valueCol).cast(d184)).as("__rev"))
      .graftCheckpoint(true)
    val ranked = Ranks.globalRowNumber(
      perE.select(col("__id"), col("__rev"),
        (-col("__rev")).cast("double").as("__neg")),
      "__neg", "__id")
    // adaptive rank blocks: ≤ 1024 blocks at any N (see
    // [[Ranks.averagePrecision]])
    val nTotal = broadcast(perE.agg(count(lit(1)).as("__N")))
    val withRb = ranked.crossJoin(nTotal)
      .withColumn("__rb", ((col("rank") - 1L) /
        greatest(lit(1L), expr("(__N + 1023) div 1024"))).cast("long"))
    val wGrid = Window.orderBy(col("__rb").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val pre = withRb.groupBy("__rb").agg(sum(col("__rev")).as("__bn"))
      .withColumn("__pp", sum("__bn").over(wGrid))
      .select(col("__rb"), col("__pp"))
    val wLocal = Window.partitionBy("__rb").orderBy(col("rank").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val total = broadcast(perE.agg(sum(col("__rev")).as("__tot")))
    withRb.join(broadcast(pre), "__rb").crossJoin(total)
      .withColumn("__cum",
        coalesce(col("__pp"), lit(0)) + sum(col("__rev")).over(wLocal))
      .withColumn("abc_class",
        when(col("__cum") * 1000 <= col("__tot") * aCutPermille, "A")
          .when(col("__cum") * 1000 <= col("__tot") * bCutPermille, "B")
          .otherwise("C"))
      .groupBy("abc_class")
      .agg(count(lit(1)).as("n_entities"),
        sum(col("__rev")).as("__crev"), max(col("__tot")).as("__t"))
      .select(col("abc_class"), col("n_entities"),
        round(col("__crev").cast("double"), 2).as("revenue"),
        // integer ppm on exact cents in DECIMAL(38,0) (cents·1e6
        // overflows LONG already at ~$100 B class totals)
        expr("cast(__crev * 100 as decimal(38,0)) * 1000000 div " +
          "cast(__t * 100 as decimal(38,0))").as("share_ppm"))
      .orderBy("abc_class")
  }

  /** Revenue bridge (price/volume/mix decomposition): explains the
    * revenue change between two periods as Σ price effects
    * ((p₂−p₁)·q₂), Σ volume effects (p₁·(q₂−q₁)), plus NEW (only in
    * period 2) and LOST (only in period 1) entity buckets — the FP&A
    * "why did revenue move" readout, exact by the algebraic identity
    * p₂q₂ − p₁q₁ = (p₂−p₁)q₂ + p₁(q₂−q₁). One scan to per-(entity,
    * period) decimal sums; unit prices are DOUBLE ratios of exact
    * decimal sums (never decimal division); per-entity effect terms
    * are identical doubles rounded to 4 dp and DECIMAL-summed.
    * Returns (component, amount) for price/volume/new/lost/
    * delta_total ordered by component — price+volume+new+lost equals
    * delta_total up to 4-dp rounding dust. */
  def revenueBridge(df: DataFrame, entityCol: String, periodCol: Column,
      revenueCol: String, qtyCol: String): DataFrame = {
    val d284 = DecimalType(28, 4)
    val per = df
      .select(col(entityCol).as("e"), periodCol.as("p2"),
        col(revenueCol).cast(d184).as("r"),
        col(qtyCol).cast(d184).as("q"))
      .groupBy("e", "p2")
      .agg(sum(col("r")).as("r"), sum(col("q")).as("q"))
    def side(flag: Boolean, c: String) =
      max(when(col("p2") === flag, col(c)))
    val wide = per.groupBy("e")
      .agg(side(false, "r").as("r1"), side(false, "q").as("q1"),
        side(true, "r").as("r2"), side(true, "q").as("q2"))
      .graftCheckpoint(true)
    val both = wide.filter(col("r1").isNotNull && col("r2").isNotNull
      && col("q1") > 0 && col("q2") > 0)
    val p1 = col("r1").cast("double") / col("q1").cast("double")
    val p2 = col("r2").cast("double") / col("q2").cast("double")
    val eff = both.agg(
      sum(round((p2 - p1) * col("q2").cast("double"), 4).cast(d284))
        .as("price"),
      sum(round(p1 * (col("q2").cast("double")
        - col("q1").cast("double")), 4).cast(d284)).as("volume"))
    val newLost = wide.agg(
      sum(when(col("r1").isNull, col("r2"))).as("newr"),
      sum(when(col("r2").isNull, -col("r1"))).as("lostr"),
      (sum(coalesce(col("r2"), lit(0).cast("decimal(18,4)")))
        - sum(coalesce(col("r1"), lit(0).cast("decimal(18,4)"))))
        .as("delta"))
    eff.crossJoin(broadcast(newLost))
      .select(explode(array(
        struct(lit("1_price").as("component"),
          round(col("price").cast("double"), 2).as("amount")),
        struct(lit("2_volume").as("component"),
          round(col("volume").cast("double"), 2).as("amount")),
        struct(lit("3_new").as("component"),
          round(coalesce(col("newr").cast("double"), lit(0.0)), 2)
            .as("amount")),
        struct(lit("4_lost").as("component"),
          round(coalesce(col("lostr").cast("double"), lit(0.0)), 2)
            .as("amount")),
        struct(lit("5_delta_total").as("component"),
          round(col("delta").cast("double"), 2).as("amount"))))
        .as("x"))
      .select(col("x.component").as("component"), col("x.amount"))
      .orderBy("component")
  }

  /** Lorenz-curve decile table — the inequality PROFILE behind
    * [[Ranks.gini]]'s single number: entities ranked ASCENDING by
    * value (id tiebreak), cut into 10 rank deciles, each reporting
    * its exact revenue and the cumulative share in truncated ppm (a
    * perfectly equal base shows cum_share ≈ decile/10; a concentrated
    * one hugs 0 until the top decile). Rank via the bucketed
    * row-number machinery, decile assignment and shares in exact
    * integer/DECIMAL arithmetic — no float anywhere. Returns
    * (decile, n_entities, revenue, cum_share_ppm) ordered by decile. */
  def lorenzDeciles(df: DataFrame, entityCol: String, valueCol: String)
      : DataFrame = {
    val perE = df.groupBy(col(entityCol).as("__id"))
      .agg(sum(col(valueCol).cast(d184)).as("__rev"))
      .graftCheckpoint(true)
    val ranked = Ranks.globalRowNumber(
      perE.select(col("__id"), col("__rev"),
        col("__rev").cast("double").as("__rd")),
      "__rd", "__id")
    val total = broadcast(perE.agg(sum(col("__rev")).as("__tot"),
      count(lit(1)).as("__n")))
    val byDecile = ranked.crossJoin(total)
      .withColumn("decile",
        least(lit(9L), expr("((rank - 1) * 10) div __n")))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_entities"),
        sum(col("__rev")).as("__drev"), max(col("__tot")).as("__t"))
    val wCum = Window.orderBy("decile") // 10-row grid
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byDecile
      .withColumn("__cum", sum(col("__drev")).over(wCum))
      .select(col("decile"), col("n_entities"),
        round(col("__drev").cast("double"), 2).as("revenue"),
        expr("cast(__cum * 100 as decimal(38,0)) * 1000000 div " +
          "cast(__t * 100 as decimal(38,0))").as("cum_share_ppm"))
      .orderBy("decile")
  }
}
