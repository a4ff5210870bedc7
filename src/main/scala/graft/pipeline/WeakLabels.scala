package graft.pipeline

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
}
