package graft.operators

import graft.operators.Ckpt.CkptOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Isotonic (monotone) calibration by pool-adjacent-violators, solved
  * on a BOUNDED bin grid via the minimax identity
  * μ_i = max_{j≤i} min_{k≥i} (Σ_{j..k} pos / Σ_{j..k} n) — the PAV
  * fit without the sequential merge loop, so it is expressible as a
  * grid self-join in both engines. The corpus never appears here: the
  * caller aggregates scores into `nBins` reliability bins (one
  * partial-agg scan, e.g. [[graft.pipeline.QualityClassifier
  * .calibration]]'s table), and everything below runs on ≤ nBins²
  * range pairs — metadata-sized work.
  *
  * Determinism: range rates are integer-ppm (LONG `div`), so every
  * min/max comparison is exact integer arithmetic — no float enters
  * until the caller divides by 1e6 for display.
  */
object Isotonic {

  /** PAV fit over a binned reliability table `binned(bin, n, pos)`
    * (bin an orderable numeric, n > 0). Returns (bin, n, pos,
    * raw_rate_ppm, iso_rate_ppm) ordered by bin, with iso_rate_ppm
    * nondecreasing in bin — the calibrated replacement for raw
    * per-bin rates that zig-zag from sampling noise. */
  def pavPpm(binned: DataFrame): DataFrame = {
    val t = binned.select(col("bin").cast("long").as("bin"),
      col("n").cast("long").as("n"), col("pos").cast("long").as("pos"))
      .graftCheckpoint(true)
    // range aggregates over every contiguous [j, k]: a triangular
    // self-join on the bin grid (≤ nBins² rows)
    val ranges = t.select(col("bin").as("j")).crossJoin(
        t.select(col("bin").as("k"))).filter(col("j") <= col("k"))
      .join(t, col("bin") >= col("j") && col("bin") <= col("k"))
      .groupBy("j", "k")
      .agg(sum(col("pos")).as("rp"), sum(col("n")).as("rn"))
      .select(col("j"), col("k"),
        expr("(rp * 1000000) div rn").as("rate_ppm"))
    // μ_i = max_{j≤i} min_{k≥i} rate(j, k) — inner min per (i, j),
    // outer max per i, all on exact ppm longs
    val fit = t.select(col("bin").as("i"))
      .join(ranges, col("j") <= col("i") && col("k") >= col("i"))
      .groupBy("i", "j").agg(min(col("rate_ppm")).as("mn"))
      .groupBy("i").agg(max(col("mn")).as("iso_rate_ppm"))
    t.join(fit, t("bin") === fit("i"))
      .select(col("bin"), col("n"), col("pos"),
        expr("(pos * 1000000) div n").as("raw_rate_ppm"),
        col("iso_rate_ppm"))
      .orderBy("bin")
  }
}
