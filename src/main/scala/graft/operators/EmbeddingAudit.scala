package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-corpus health audits beyond the spectrum view ([[Pca]],
  * q194): (1) centroid DRIFT between two snapshots of the same
  * labelled space — the "did my embedder/model update silently move a
  * class?" check run before swapping an index or re-training on
  * refreshed vectors; (2) per-dimension SQ8 QUANTIZATION
  * reconstruction error — the "which dimensions does int8 compression
  * actually hurt?" audit behind the scalar-quantized ANN legs
  * (q66/q82).
  *
  * Exactness discipline (the q201 lesson): inputs pre-round to 6 dp
  * (micro-integers), every aggregate is an exact integer sum in any
  * order, and each reported ratio is produced by INTEGER
  * half-away-from-zero rounding of an exact numerator followed by one
  * final integer→double division — zero cells are the integer 0
  * (+0.0 in every engine), and oracles replay the algebra
  * token-for-token. */
object EmbeddingAudit {

  private def microK(el: Column): Column =
    round(round(el.cast("double"), 6) * 1e6, 0).cast("decimal(38,0)")

  /** ‖mean_old − mean_new‖² per group: (group, n_old, n_new,
    * l2_shift_sq) with the squared shift rounded to 9 dp. `oldFlag`
    * splits the corpus into the two snapshots. One posexplode scan +
    * two fixed-cardinality groupBys (groups × dims, then groups);
    * cross-multiplied integer numerators (ska·nB − skb·nA per dim)
    * keep the whole computation division-free until the last step. */
  def centroidShift(embs: DataFrame, vecCol: String, dim: Int,
      groupCol: String, oldFlag: Column): DataFrame = {
    val perDim = embs
      .select(col(groupCol).as("grp"), oldFlag.as("is_old"),
        posexplode(col(vecCol)).as(Seq("k", "x")))
      .groupBy(col("grp"), col("k"))
      .agg(
        sum(when(col("is_old"), microK(col("x")))
          .otherwise(lit(0).cast("decimal(38,0)"))).as("ska"),
        sum(when(!col("is_old"), microK(col("x")))
          .otherwise(lit(0).cast("decimal(38,0)"))).as("skb"),
        sum(when(col("is_old"), 1L).otherwise(0L))
          .cast("decimal(38,0)").as("na"),
        sum(when(!col("is_old"), 1L).otherwise(0L))
          .cast("decimal(38,0)").as("nb"))
    perDim
      .groupBy(col("grp"))
      .agg(
        // nA/nB are per-group constants replicated across dims
        max(col("na")).as("na"), max(col("nb")).as("nb"),
        sum((col("ska") * col("nb") - col("skb") * col("na")) *
          (col("ska") * col("nb") - col("skb") * col("na"))).as("num"))
      .filter(col("na") > 0 && col("nb") > 0)
      .select(col("grp"),
        col("na").cast("long").as("n_old"),
        col("nb").cast("long").as("n_new"),
        (expr("""((2 * num + na*na*nb*nb*1000) DIV
                  (2 * na*na*nb*nb*1000))""")
          .cast("double") / 1e9).as("l2_shift_sq"))
      .orderBy("grp")
  }

  /** d×d cross second-moment grid between PAIRED embedding snapshots
    * — M[i][j] = mean(a_i · b_j) over the pair relation: the
    * sufficient statistic for aligning two embedding spaces (the
    * orthogonal-Procrustes solve in [[Pca.procrustesAlign]] is pure
    * driver math on this grid), and the asymmetric companion to
    * q201's covariance. Same exactness discipline: micro-scaled
    * integer products, DECIMAL(38,0) sums in any order, ONE signed
    * integer half-away rounding per cell. One explode scan
    * (pairs × d² product terms) into a d²-key partial aggregate —
    * no joins, no windows; at corpus scale the d²-cell shuffle is
    * metadata-sized. Returns (i, j, n, xmom) ordered by (i, j). */
  def crossSecondMoment(pairs: DataFrame, aCol: String, bCol: String,
      dim: Int): DataFrame = {
    def micro(v: String) =
      s"CAST(round(round(CAST($v AS DOUBLE), 6) * 1000000, 0) " +
        "AS DECIMAL(38,0))"
    val prods = pairs.select(explode(expr(
      s"flatten(transform($aCol, (x, i) -> transform($bCol, (y, j) " +
        s"-> struct(i * $dim + j AS k, " +
        s"${micro("x")} * ${micro("y")} AS p))))")).as("e"))
    prods.select(col("e.k").as("k"), col("e.p").as("p"))
      .groupBy("k").agg(count(lit(1)).as("n"),
        sum(col("p")).cast("decimal(38,0)").as("num"))
      .select(expr(s"CAST(k DIV $dim AS INT)").as("i"),
        expr(s"CAST(k % $dim AS INT)").as("j"),
        col("n"),
        (expr("""CASE WHEN num < 0
                 THEN -((2 * (-num) + n * 1000000)
                        DIV (2 * n * 1000000))
                 ELSE  ((2 *  num   + n * 1000000)
                        DIV (2 * n * 1000000)) END""")
          .cast("double") / 1e6).as("xmom"))
      .orderBy("i", "j")
  }

  /** Per-dimension SQ8 reconstruction audit: quantize each coordinate
    * to 255 levels over its corpus [min, max] (the q66/q82 scheme) and
    * report (dim, n, lo, hi, mse) — MSE of x − dequant(quant(x)) in
    * original units², rounded to 12 dp. A constant dimension (hi = lo)
    * reconstructs exactly: mse 0. */
  def sq8ReconstructionError(embs: DataFrame, vecCol: String): DataFrame = {
    val ks = embs.select(posexplode(col(vecCol)).as(Seq("dim", "x")))
      .select(col("dim"), microK(col("x")).as("kv"))
    val bounds = ks.groupBy("dim")
      .agg(min(col("kv")).as("lo"), max(col("kv")).as("hi"),
        count(lit(1)).as("n"))
    val joined = ks.join(broadcast(bounds), "dim")
      .withColumn("d", col("hi") - col("lo"))
      // code = round((k-lo)·255 / d), half away (operands ≥ 0);
      // recon = lo + round(code·d / 255) — exact integer micro algebra
      .withColumn("code", when(col("d") === 0, lit(0L)).otherwise(
        expr("(2 * (kv - lo) * 255 + d) DIV (2 * d)")))
      .withColumn("errm",
        col("kv") - (col("lo") +
          expr("(2 * code * d + 255) DIV (2 * 255)")))
    joined
      .groupBy("dim")
      .agg(max(col("n")).as("n"), max(col("lo")).as("lo"),
        max(col("hi")).as("hi"),
        sum(col("errm") * col("errm")).cast("decimal(38,0)").as("sse"))
      .select(col("dim"), col("n"),
        (col("lo").cast("double") / 1e6).as("lo"),
        (col("hi").cast("double") / 1e6).as("hi"),
        // mse = (integer-half-away of sse/n) / 1e12 — micro² → units²
        (expr("(2 * sse + n) DIV (2 * n)").cast("double") / 1e12)
          .as("mse"))
      .orderBy("dim")
  }
}
