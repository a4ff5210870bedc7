package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed bootstrap confidence intervals — the Poisson bootstrap
  * (Chamandy et al., "Estimating Uncertainty for Massive Data Streams",
  * Google 2012): multinomial resampling is impossible without knowing n
  * up front, but per-row INDEPENDENT Poisson(1) weights converge to the
  * same resampling distribution, so each replica is a weighted
  * aggregate computed in the SAME scan — B replicas cost one pass, not
  * B passes.
  *
  * Weight draws are deterministic AND hash-thrifty: one md5 digest
  * yields EIGHT 15-bit uniform draws (2 × 60-bit halves × 4 slots), so
  * 32 replicas hash each row 4 times, not 32 — at 100 TB the hash is
  * the dominant per-row cost of the whole estimator. Draws feed the
  * Poisson(1) inverse CDF with thresholds pre-scaled to the 2^15 grain
  * (integer compares — engine-exact; the ladder constants are computed
  * once here and interpolated verbatim into the oracle SQL). Replica
  * means round to 6 dp BEFORE the percentile so the CI is
  * engine-identical. */
object Bootstrap {

  /** Poisson(1) CDF thresholds scaled to the 15-bit draw grain:
    * round(P(K ≤ k) · 2^15) for k = 0..6; draws past the last
    * threshold cap at 7 (P ≈ 8e-5). */
  val PoissonCdf15: Seq[Long] = {
    val e1 = math.exp(-1.0)
    val pmf = (0 to 6).scanLeft(e1)((p, k) => p / (k + 1)).take(7)
    pmf.scanLeft(0.0)(_ + _).drop(1)
      .map(c => math.rint(c * 32768).toLong)
  }

  private def weight(u: Column): Column =
    PoissonCdf15.zipWithIndex.foldRight(
      lit(PoissonCdf15.size.toLong)) { case ((t, k), acc) =>
      when(u < t, k.toLong).otherwise(acc)
    }

  /** One row: (n, mean, ci_lo, ci_hi) — the alpha/2 .. 1-alpha/2
    * percentile interval of `nReplicas` Poisson-bootstrap replica means
    * of `valueCol`. */
  def meanCi(df: DataFrame, idCol: String, valueCol: String,
      nReplicas: Int = 32, alpha: Double = 0.05): DataFrame = {
    // stage the hash work: digests → 60-bit halves as COLUMNS, so each
    // digest/conv runs once per row (32 inline copies would both repeat
    // the hash and blow the generated method past JIT limits)
    val nBlocks = (nReplicas + 7) / 8
    val digests = df.select(col(valueCol).cast("double").as("v") +:
      (0 until nBlocks).map(b => md5(concat(col(idCol).cast("string"),
        lit(":" + b))).as(s"h$b")): _*)
    val halves = digests.select(col("v") +:
      (0 until nBlocks).flatMap(b => Seq(
        conv(substring(col(s"h$b"), 1, 15), 16, 10).cast("long")
          .as(s"lo$b"),
        conv(substring(col(s"h$b"), 17, 15), 16, 10).cast("long")
          .as(s"hi$b"))): _*)
    def draw(r: Int): Column = {
      val half = col((if ((r % 8) < 4) "lo" else "hi") + (r / 8))
      shiftright(half, (r % 4) * 15) % 32768
    }
    // every replica is TWO aggregate columns of the same scan — no
    // row explosion, no replica shuffle; the whole resample reduces
    // map-side to one 2·B-column row
    val weighted = halves.select(col("v") +:
      (0 until nReplicas).map(r => weight(draw(r)).as(s"w$r")): _*)
    val sums = weighted.agg(
      sum(col("w0") * col("v")).as("swv0"),
      (1 until nReplicas).map(r =>
        sum(col(s"w$r") * col("v")).as(s"swv$r")) ++
      (0 until nReplicas).map(r => sum(col(s"w$r")).as(s"sw$r")): _*)
    val means = sums.select(explode(array((0 until nReplicas).map(r =>
        round(col(s"swv$r") / col(s"sw$r"), 6)): _*)).as("m"))
    val base = df.agg(count(lit(1)).cast("long").as("n"),
      round(avg(col(valueCol).cast("double")), 6).as("mean"))
    base.crossJoin(broadcast(means.agg(
        round(expr(s"percentile(m, ${alpha / 2}D)"), 6).as("ci_lo"),
        round(expr(s"percentile(m, ${1 - alpha / 2}D)"), 6).as("ci_hi"))))
  }
}
