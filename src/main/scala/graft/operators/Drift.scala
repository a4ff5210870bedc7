package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift detection between a reference and a current slice
  * of a metric column — the Population Stability Index (PSI), the
  * standard data-quality gate in front of a model-training pipeline
  * (PSI < 0.1 stable, 0.1–0.25 drifting, > 0.25 shifted).
  *
  * Bins are the reference slice's interior deciles, so the reference
  * distributes ~uniformly across bins and the index measures how far
  * the current slice departs. Scale shape: the bin edges are ONE
  * interpolated-percentile aggregate over the reference (a 1-row
  * relation, broadcast back — the q151/q161 pattern); binning is a
  * codegen'd comparison chain; everything after is a 10-row grid.
  * Laplace smoothing (+0.5 per bin) keeps ln finite when a bin empties.
  * Edges are rounded to 6 dp BEFORE binning so the bin boundaries are
  * engine-exact (percentile interpolation is the only non-integer
  * arithmetic upstream of the counts). */
object Drift {

  /** PSI of `valueCol` between the rows where `isRef` holds (reference)
    * and the rest (current). Returns one row per bin:
    * (bin, ref_n, cur_n, psi_bin), bins 1..nBins on reference deciles,
    * plus the total as a final row with bin = 0 is NOT emitted — sum
    * psi_bin for the headline number. */
  def psiBins(df: DataFrame, valueCol: String, isRef: Column,
      nBins: Int = 10): DataFrame = {
    val v = col(valueCol).cast("double")
    val base = df.select(v.as("v"), isRef.as("is_ref"))
    val qs = (1 until nBins).map(i => i.toDouble / nBins)
    val edges = base.filter(col("is_ref"))
      .agg(expr(s"percentile(v, array(${qs.mkString(",")}))").as("es"))
      .select((0 until nBins - 1).map(i =>
        round(element_at(col("es"), i + 1), 6).as(s"e$i")): _*)
    val binExpr = (0 until nBins - 1)
      .map(i => when(col("v") > col(s"e$i"), 1).otherwise(0))
      .reduce(_ + _) + 1
    val counts = base.crossJoin(broadcast(edges))
      .select(binExpr.as("bin"), col("is_ref"))
      .groupBy("bin")
      .agg(sum(when(col("is_ref"), 1L).otherwise(0L)).as("ref_n"),
        sum(when(!col("is_ref"), 1L).otherwise(0L)).as("cur_n"))
    val totals = counts.agg(sum("ref_n").as("rt"), sum("cur_n").as("ct"))
    counts.crossJoin(broadcast(totals))
      .select(col("bin").cast("long").as("bin"), col("ref_n"),
        col("cur_n"),
        round(((col("cur_n") + 0.5) / (col("ct") + 0.5 * nBins) -
          (col("ref_n") + 0.5) / (col("rt") + 0.5 * nBins)) *
          log(((col("cur_n") + 0.5) / (col("ct") + 0.5 * nBins)) /
            ((col("ref_n") + 0.5) / (col("rt") + 0.5 * nBins))), 6)
          .as("psi_bin"))
      .orderBy("bin")
  }

  /** Reference-side artifact for streaming drift checks: rounded decile
    * edges + smoothed per-bin proportions, computed ONCE over the
    * reference corpus and then frozen (broadcast literals per
    * micro-batch — the reference is never rescanned). */
  def referenceProfile(ref: DataFrame, valueCol: String,
      nBins: Int = 10): (Seq[Double], Seq[Double]) = {
    val v = col(valueCol).cast("double")
    val qs = (1 until nBins).map(i => i.toDouble / nBins)
    val base = ref.select(v.as("v"))
    val edges = base
      .agg(expr(s"percentile(v, array(${qs.mkString(",")}))").as("es"))
      .head().getSeq[Double](0).map(e => math.rint(e * 1e6) / 1e6)
    val binExpr = edges
      .map(e => when(col("v") > e, 1).otherwise(0))
      .reduce(_ + _) + 1
    val counts = base.select(binExpr.as("bin"))
      .groupBy("bin").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val n = counts.values.sum
    val props = (1 to nBins).map(b =>
      (counts.getOrElse(b, 0L) + 0.5) / (n + 0.5 * nBins))
    (edges.toSeq, props)
  }

  /** PSI of `cur` against a frozen [[referenceProfile]] — one scan of
    * the current slice, a 10-row grid after. Returns one row:
    * (n_rows, psi). */
  def psiAgainstReference(cur: DataFrame, valueCol: String,
      edges: Seq[Double], refProps: Seq[Double]): DataFrame = {
    val v = col(valueCol).cast("double")
    val nBins = refProps.size
    val binExpr = edges
      .map(e => when(v > e, 1).otherwise(0))
      .reduce(_ + _) + 1
    val counts = cur.select(binExpr.as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n"))
    val total = counts.agg(sum("n").as("t"))
    import cur.sparkSession.implicits._
    val refDf = refProps.zipWithIndex.map { case (p, i) => (i + 1, p) }
      .toDF("bin", "ref_p")
    // coalesce the total too: an EMPTY current slice must yield a
    // defined psi (smoothed uniform vs ref), never a null that a
    // downstream `psi > bar` gate silently waves through
    counts.join(broadcast(refDf), Seq("bin"), "full_outer")
      .crossJoin(broadcast(total))
      .select(coalesce(col("n"), lit(0L)).as("n"), col("ref_p"),
        ((coalesce(col("n"), lit(0L)) + 0.5) /
          (coalesce(col("t"), lit(0L)) + 0.5 * nBins)).as("cur_p"))
      .agg(sum(col("n")).as("n_rows"),
        round(sum((col("cur_p") - col("ref_p")) *
          log(col("cur_p") / col("ref_p"))), 6).as("psi"))
  }

  /** Jensen–Shannon divergence between the CATEGORY distributions of
    * two slices — the bounded, symmetric drift measure ([0, ln 2]
    * nats) that PSI's binned form approximates: JS = ½KL(P‖M) +
    * ½KL(Q‖M), M = ½(P+Q). Zero-count categories are exact limits
    * (0·ln 0 = 0), so no smoothing constant to tune — the reason to
    * prefer JS for categorical drift. One partial-agg scan to the
    * category grid; per-category terms are identical double
    * expressions rounded to 9 dp and DECIMAL-summed. Returns one row
    * (n_a, n_b, js_nats, js_norm) with js_norm = JS/ln 2 ∈ [0, 1]. */
  def jsDivergence(df: DataFrame, keyCol: String, inA: Column)
      : DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val cells = df
      .select(col(keyCol).as("k"), inA.as("__a"))
      .groupBy("k")
      .agg(sum(when(col("__a"), 1L).otherwise(0L)).as("ca"),
        sum(when(!col("__a"), 1L).otherwise(0L)).as("cb"))
    val tot = broadcast(cells.agg(sum("ca").as("na"), sum("cb").as("nb")))
    val p = col("ca").cast("double") / col("na").cast("double")
    val q = col("cb").cast("double") / col("nb").cast("double")
    val m = (p + q) / 2.0
    def kl(x: Column) = when(x > 0.0, x * log(x / m)).otherwise(lit(0.0))
    cells.crossJoin(tot)
      .select(col("na"), col("nb"),
        round(kl(p) / 2.0 + kl(q) / 2.0, 9)
          .cast(DecimalType(28, 9)).as("t"))
      .groupBy("na", "nb").agg(sum(col("t")).cast("double").as("js"))
      .select(col("na").as("n_a"), col("nb").as("n_b"),
        round(col("js"), 6).as("js_nats"),
        round(col("js") / math.log(2.0), 6).as("js_norm"))
  }
}
