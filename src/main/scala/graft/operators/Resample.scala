package graft.operators

import graft.operators.Ckpt.CkptOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Resampling inference beyond the Poisson bootstrap ([[Bootstrap]]):
  * the seeded paired permutation test (exact-null inference with no
  * distributional assumptions) and the delete-one-bucket jackknife
  * (the standard variance estimator for RATIO metrics, where unit
  * variances don't add — Efron & Tibshirani 1993; the hash-bucket
  * form is what large experimentation platforms run).
  *
  * Determinism discipline: permutation signs come from md5 nibble
  * parity of (perm, unit) — a pure function, reproducible on any
  * engine with no RNG state (same convention as [[Projection]]);
  * every heavy sum is a DECIMAL reduction of per-row rounded terms,
  * so results are partitioning-independent and oracle-exact.
  */
object Resample {

  private def even(c: Column): Column =
    substring(md5(c), 1, 1).isin("0", "2", "4", "6", "8", "a", "c", "e")

  /** Two-sided paired permutation test. `df` holds one row per unit
    * with key `keyCol` and paired difference `diffCol`; the null
    * randomly flips each unit's sign. Returns one row
    * (n_pairs, mean_diff, m_perms, n_extreme, p_value) with the
    * add-one p-value (1 + #{|T_p| ≥ |T_0|}) / (m + 1).
    * Scale: the flipped-replica relation is m × n rows but purely
    * map + partial-agg (one shuffle of m × buckets); |T_p| ≥ |T_0| is
    * an exact DECIMAL comparison, so extremeness is never a float
    * coin-flip. */
  def permutationTest(df: DataFrame, keyCol: String, diffCol: String,
      mPerms: Int = 200): DataFrame = {
    require(mPerms >= 1)
    val d = df.select(col(keyCol).cast("string").as("k"),
      round(col(diffCol).cast("double"), 9).cast(DecimalType(28, 9)).as("d"))
    val obs = d.agg(sum(col("d")).as("t0"), count(lit(1)).as("n"))
    val reps = d
      .select(col("k"), col("d"),
        explode(array((0 until mPerms).map(lit(_)): _*)).as("p"))
      .select(col("p"),
        when(even(concat(col("p"), lit("_"), col("k"))), col("d"))
          .otherwise(-col("d")).as("t"))
      .groupBy("p").agg(sum(col("t")).as("tp"))
    val ext = reps.crossJoin(broadcast(obs))
      .filter(abs(col("tp")) >= abs(col("t0")))
      .agg(count(lit(1)).as("n_extreme"))
    broadcast(obs).crossJoin(ext)
      .select(col("n").as("n_pairs"),
        round(col("t0").cast("double") / col("n").cast("double"), 6)
          .as("mean_diff"),
        lit(mPerms).as("m_perms"), col("n_extreme"),
        round((lit(1.0) + col("n_extreme").cast("double"))
          / (lit(mPerms.toDouble) + 1.0), 6).as("p_value"))
  }

  /** Delete-one-bucket jackknife standard error for the ratio
    * R = Σ num / Σ den, units hashed into `nBuckets` pseudo-replicas.
    * ONE partial-agg scan to bucket-level decimal sums (metadata
    * frame), then leave-one-out ratios and Tukey's variance on it.
    * Returns (r, se_jack, n_buckets). Leave-one-out ratios round to
    * 9 dp before the replica mean so the tiny reduction is order-free
    * too. */
  def jackknifeRatio(df: DataFrame, keyCol: String, numCol: String,
      denCol: String, nBuckets: Int = 32): DataFrame = {
    require(nBuckets >= 2)
    val d184 = DecimalType(18, 4)
    val buckets = df
      .select((conv(substring(md5(col(keyCol).cast("string")), 1, 15),
          16, 10).cast("long") % nBuckets).as("b"),
        col(numCol).cast(d184).as("y"), col(denCol).cast(d184).as("x"))
      .groupBy("b").agg(sum(col("y")).as("sy"), sum(col("x")).as("sx"))
    val tot = buckets.agg(sum(col("sy")).as("ty"), sum(col("sx")).as("tx"),
      count(lit(1)).as("nb"))
    val loo = buckets.crossJoin(broadcast(tot))
      .select(col("ty"), col("tx"), col("nb"),
        round((col("ty") - col("sy")).cast("double")
          / (col("tx") - col("sx")).cast("double"), 9)
          .cast(DecimalType(28, 9)).as("ri"))
    val m = loo.groupBy("ty", "tx", "nb")
      .agg(sum(col("ri")).as("sr"))
      .select(col("ty"), col("tx"), col("nb"),
        (col("sr").cast("double") / col("nb").cast("double")).as("rbar"))
    loo.join(broadcast(m), Seq("ty", "tx", "nb"))
      .select(col("ty"), col("tx"), col("nb"),
        // 6 dp: squared deviations can reach ~1e6 for money-scaled
        // ratios; a finer scale would push v·10^dp past 2^53 where the
        // two engines' double-rounding algorithms become observable
        round((col("ri").cast("double") - col("rbar"))
            * (col("ri").cast("double") - col("rbar")), 6)
          .cast(DecimalType(38, 6)).as("q"))
      .groupBy("ty", "tx", "nb").agg(sum(col("q")).cast("double").as("ss"))
      .select(
        round(col("ty").cast("double") / col("tx").cast("double"), 6)
          .as("r"),
        round(sqrt((col("nb").cast("double") - 1.0)
          / col("nb").cast("double") * col("ss")), 6).as("se_jack"),
        col("nb").cast("int").as("n_buckets"))
  }

  /** A FLEET of per-group paired permutation tests with
    * Benjamini–Hochberg FDR control — the experimentation-platform
    * endgame: run [[permutationTest]] simultaneously in every cell of
    * `groupCol` (one m×n map + partial-agg pass keyed (group, perm) —
    * never one job per cell), then BH-adjust ENTIRELY in integer
    * arithmetic: permutation p-values are exact add-one fractions
    * (e+1)/(m+1), so the step-up condition p_(i) ≤ i·α/k becomes
    * (e+1)·k·10⁶ ≤ i·α_ppm·(m+1) on LONGs — no float ever decides a
    * rejection. Ranks tie-break (extreme-count asc, group asc); all
    * BH work runs on the k-row metadata frame. Returns
    * (group, n_pairs, mean_diff, n_extreme, p_value, significant)
    * ordered by group. */
  def permutationTestsFdr(df: DataFrame, groupCol: String,
      keyCol: String, diffCol: String, mPerms: Int = 200,
      alphaPpm: Long = 50000L): DataFrame = {
    require(mPerms >= 1 && alphaPpm > 0 && alphaPpm < 1000000L)
    val d = df.select(col(groupCol).cast("string").as("g"),
      col(keyCol).cast("string").as("k"),
      round(col(diffCol).cast("double"), 9).cast(DecimalType(28, 9))
        .as("d"))
    val obs = d.groupBy("g")
      .agg(sum(col("d")).as("t0"), count(lit(1)).as("n"))
    val reps = d
      .select(col("g"), col("k"), col("d"),
        explode(array((0 until mPerms).map(lit(_)): _*)).as("p"))
      .select(col("g"), col("p"),
        when(even(concat(col("p"), lit("_"), col("k"))), col("d"))
          .otherwise(-col("d")).as("t"))
      .groupBy("g", "p").agg(sum(col("t")).as("tp"))
    val ext = reps.join(obs, "g")
      .filter(abs(col("tp")) >= abs(col("t0")))
      .groupBy("g").agg(count(lit(1)).as("e"))
    val cells = obs.join(ext, Seq("g"), "left")
      .withColumn("e", coalesce(col("e"), lit(0L)))
      .graftCheckpoint(true) // k-row metadata frame from here on
    val k = cells.count()
    val wRank = Window.orderBy(col("e").asc, col("g").asc)
    val ranked = cells.withColumn("i", row_number().over(wRank))
      .withColumn("__ok",
        (col("e") + 1L) * lit(k) * lit(1000000L) <=
          col("i") * lit(alphaPpm) * lit(mPerms + 1L))
    val wAll = Window
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    ranked
      .withColumn("__imax", max(when(col("__ok"), col("i"))).over(wAll))
      .select(col("g").as(groupCol), col("n").as("n_pairs"),
        round(col("t0").cast("double") / col("n").cast("double"), 6)
          .as("mean_diff"),
        col("e").as("n_extreme"),
        round((lit(1.0) + col("e").cast("double"))
          / (lit(mPerms.toDouble) + 1.0), 6).as("p_value"),
        (col("__imax").isNotNull && col("i") <= col("__imax"))
          .as("significant"))
      .orderBy(groupCol)
  }
}
