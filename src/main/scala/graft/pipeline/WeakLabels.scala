package graft.pipeline

import graft.operators.Ckpt.CkptOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Weak-supervision label model (the Snorkel pattern, Ratner et al.
  * 2017): cheap deterministic labeling functions (LFs) vote
  * {-1, 0, +1} per document, per-LF reliability is estimated from
  * inter-LF agreement (no gold labels), and the final label is the
  * reliability-weighted vote — programmatic labeling for corpus-scale
  * quality triage where hand labels don't exist.
  *
  * One-step agreement model: majority sign per doc → each LF's
  * balanced-accuracy weight w = 2·agree/total − 1 against that
  * majority (abstains and tied docs excluded) → weighted re-vote.
  *
  * Scale shape: LF votes are row-local codegen'd column algebra riding
  * ONE scan; the reliability stats are a single 1-row aggregate (2
  * numbers per LF) that returns as a broadcast; the weighted re-vote is
  * again row-local. No shuffle except the output ordering — the same
  * free-rider profile as the Gopher filter (q137).
  */
object WeakLabels {

  /** The default LF battery over a text column: length, alphanumeric
    * density, shouting punctuation, digit noise, stopword evidence.
    * Each is portable column algebra (exact-rational ratios, no float
    * accumulation) so an oracle can replay it bit-for-bit. */
  def defaultLfs(text: Column): Seq[(String, Column)] = {
    val len   = length(text)
    val aFrac = length(regexp_replace(text, "[^A-Za-z0-9]", ""))
      .cast("double") / len.cast("double")
    val dFrac = length(regexp_replace(text, "[^0-9]", ""))
      .cast("double") / len.cast("double")
    Seq(
      "lf_len" -> when(len >= 150, 1).when(len < 30, -1).otherwise(0),
      "lf_alpha" -> when(len === 0, -1)
        .when(aFrac >= 0.6, 1).when(aFrac < 0.3, -1).otherwise(0),
      "lf_shout" -> when(text.contains("!!") || text.contains("??"), -1)
        .otherwise(0),
      "lf_digit" -> when(len === 0, 0).when(dFrac > 0.3, -1).otherwise(0),
      "lf_stop" -> when(lower(text).contains(" the ")
        || lower(text).contains(" and "), 1).otherwise(0))
  }

  /** Per-doc labels: every LF vote, the unweighted majority, the
    * reliability-weighted score, and the final label sign. */
  def label(docs: DataFrame, idCol: String, textCol: String,
      lfs: Seq[(String, Column)] = null): DataFrame = {
    val fns = Option(lfs).getOrElse(defaultLfs(col(textCol)))
    val names = fns.map(_._1)
    val votes = docs.select(
      col(idCol) +: fns.map { case (n, c) => c.cast("int").as(n) }: _*)
    val maj = votes.withColumn("majority",
      signum(names.map(col).reduce(_ + _)).cast("int"))
    // one 1-row aggregate: (agree, total) per LF vs the majority sign
    val stats = maj.agg(
      lit(1).as("__one"),
      names.flatMap { n =>
        Seq(
          sum(when(col(n) =!= 0 && col("majority") =!= 0 &&
            col(n) === col("majority"), 1L).otherwise(0L))
            .as(s"agree_$n"),
          sum(when(col(n) =!= 0 && col("majority") =!= 0, 1L)
            .otherwise(0L)).as(s"total_$n"))
      }: _*)
    // weighted re-vote, fixed LF order so the fp sum is reproducible
    val score = names.map { n =>
      val w = lit(2.0) * col(s"agree_$n") /
        greatest(col(s"total_$n"), lit(1L)) - lit(1.0)
      w * col(n).cast("double")
    }.reduce(_ + _)
    maj.crossJoin(broadcast(stats.drop("__one")))
      .withColumn("score", round(score, 6))
      .select(col(idCol) +: names.map(col) :+ col("majority") :+
        col("score") :+ signum(col("score")).cast("int").as("label"): _*)
  }

  /** Cohen's κ between two categorical label columns — the
    * inter-annotator (or inter-labeling-function) agreement measure
    * that discounts chance: κ = (p_o − p_e)/(1 − p_e), with p_o the
    * observed agreement rate and p_e the agreement expected from the
    * two labelers' marginal distributions. κ=1 perfect, κ=0 chance
    * level — the go-to sanity check before trusting weak labels or a
    * crowdsourced annotation batch.
    *
    * Scale shape: ONE groupBy to the |labels|² confusion table
    * (metadata-sized), margins by re-aggregating that table, one
    * broadcast join — the corpus is scanned exactly once. Rates are
    * integer-ppm divisions, κ itself identical IEEE math from them. */
  def kappa(df: DataFrame, aCol: Column, bCol: Column): DataFrame = {
    val conf = df.groupBy(aCol.as("la"), bCol.as("lb"))
      .agg(count(lit(1)).as("c"))
    val n = conf.agg(sum(col("c")).as("n"))
    val rowM = conf.groupBy("la").agg(sum(col("c")).as("ra"))
    val colM = conf.groupBy("lb").agg(sum(col("c")).as("rb"))
    val agree = conf.filter(col("la") === col("lb"))
      .agg(coalesce(sum(col("c")), lit(0L)).as("agree"))
    val chance = rowM
      .join(colM, col("la") === col("lb")) // matching categories only
      .agg(coalesce(sum(col("ra") * col("rb")), lit(0L)).as("crossm"))
    agree.crossJoin(broadcast(n)).crossJoin(broadcast(chance))
      .select(col("n"),
        (expr("(agree * 1000000) div n").cast("double") / 1000000.0)
          .as("p_o"),
        (expr("(crossm * 1000000) div (n * n)").cast("double")
          / 1000000.0).as("p_e"))
      .select(col("n"), col("p_o"), col("p_e"),
        round((col("p_o") - col("p_e")) / (lit(1.0) - col("p_e")), 6)
          .as("kappa"))
  }

  /** McNemar's test on PAIRED binary judgments — do two labelers (or
    * model versions) disagree SYMMETRICALLY, i.e. is one
    * systematically stricter? Only the discordant cells matter:
    * χ² = (b − c)²/(b + c) with b = (a=1, b=0), c = (a=0, b=1) —
    * exact integer counts from the same one-scan confusion aggregate
    * as [[kappa]] (κ answers "do they agree"; McNemar answers "is the
    * disagreement biased"). No discordance (b + c = 0) yields a null
    * statistic, not a 0/0. Returns one row (n, b, c, chi2). */
  def mcnemar(df: DataFrame, aCol: Column, bCol: Column): DataFrame =
    df.select((aCol =!= 0).as("__a"), (bCol =!= 0).as("__b"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__a") && !col("__b"), 1L).otherwise(0L)).as("b"),
        sum(when(!col("__a") && col("__b"), 1L).otherwise(0L)).as("c"))
      .select(col("n"), col("b"), col("c"),
        when(col("b") + col("c") === 0L, lit(null).cast("double"))
          .otherwise(round(
            (col("b") - col("c")).cast("double")
              * (col("b") - col("c")).cast("double")
              / (col("b") + col("c")).cast("double"), 6)).as("chi2"))

  /** Cochran's Q (1950) — [[mcnemar]] generalized to k paired binary
    * judgments (k labelers / model versions / treatments over the same
    * blocks): with column totals T_j, row totals u_i, N = Σu_i,
    *
    *   Q = (k−1) · (k·ΣT_j² − N²) / (k·N − Σu_i²)
    *
    * asks whether any judge says "yes" at a consistently different
    * rate. At k = 2 it reduces exactly to McNemar's (b−c)²/(b+c).
    * Input is the CELL relation (blockCol, treatmentCol, successCol) —
    * one binary value per block × treatment; blocks missing any
    * treatment drop (the test needs complete blocks). Both numerator
    * and denominator are exact non-negative integers (Cauchy–Schwarz
    * gives k·ΣT² ≥ N² and k·N ≥ Σu², u_i ≤ k), DECIMAL(38,0)-summed,
    * so the one division is an unsigned integer-micro rounding —
    * engine-exact in any aggregation order. A degenerate table (every
    * block all-0 or all-1 → zero denominator) yields a null statistic,
    * not a 0/0. Returns one row (k, n_blocks, q_stat). */
  def cochranQ(cells: DataFrame, blockCol: String, treatmentCol: String,
      successCol: Column): DataFrame = {
    val src = cells.select(col(blockCol).as("b"),
      col(treatmentCol).as("t"), successCol.cast("boolean").as("x"))
    val kRow = broadcast(src.agg(countDistinct(col("t")).as("kk")))
    val complete = src.join(broadcast(
      src.groupBy("b").agg(count(lit(1)).as("nt"))
        .crossJoin(kRow).filter(col("nt") === col("kk")).select("b")),
      "b")
      .graftCheckpoint(false) // column-total AND row-total consumers
    val dec = "decimal(38,0)"
    val colAgg = complete.groupBy("t")
      .agg(sum(when(col("x"), 1L).otherwise(0L)).as("tj"))
      .agg(count(lit(1)).as("k"), sum(col("tj")).cast(dec).as("nn"),
        sum(col("tj").cast(dec) * col("tj")).as("st2"))
    val rowAgg = complete.groupBy("b")
      .agg(sum(when(col("x"), 1L).otherwise(0L)).as("u"))
      .agg(count(lit(1)).as("n_blocks"),
        sum(col("u").cast(dec) * col("u")).as("su2"))
    colAgg.crossJoin(broadcast(rowAgg))
      .select(col("k"), col("n_blocks"),
        when(col("k") < 2 || col("n_blocks") === 0
            || expr("k * nn - su2") === 0, lit(null).cast("double"))
          .otherwise(
            expr("""(2 * ((k - 1) * (k * st2 - nn * nn)) * 1000000
                    + (k * nn - su2))
                   DIV (2 * (k * nn - su2))""").cast("double") / 1e6)
          .as("q_stat"))
  }
}
