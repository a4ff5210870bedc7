package graft.pipeline

import graft.operators.Ckpt.CkptOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Group-fairness audit of a labeled, model-scored population — the
  * responsible-release gate next to [[Privacy]]'s k-anonymity check:
  * per protected group, the selection rate (demographic parity), TPR
  * and FPR (equalized odds), plus the across-group max−min gap for
  * each — the three canonical metrics (Hardt et al. 2016; Feldman et
  * al. 2015 for the parity rule) a dataset/classifier release review
  * asks for first.
  *
  * Scale shape: ONE partial-aggregated groupBy to the per-group
  * confusion counts (groups are metadata-cardinality); every rate is
  * an unsigned integer-micro division (engine-exact), and the gaps
  * subtract two identical 6-dp doubles, so the whole frame is
  * hash-stable. Degenerate groups report null rather than tripping
  * division: TPR needs a positive, FPR a negative.
  */
object Fairness {

  /** Per-group rates + global gaps. `df` carries one row per SUBJECT
    * (already aggregated to the decision unit — user, document);
    * returns (grp, n, n_pos, n_sel, sel_rate, tpr, fpr, dp_gap,
    * tpr_gap, fpr_gap) ordered by group, gap columns constant. */
  def audit(df: DataFrame, groupCol: String, labelCol: Column,
      predCol: Column): DataFrame = {
    val per = df.select(col(groupCol).as("grp"),
        labelCol.cast("boolean").as("y"), predCol.cast("boolean").as("p"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n"),
        sum(when(col("y"), 1L).otherwise(0L)).as("n_pos"),
        sum(when(col("p"), 1L).otherwise(0L)).as("n_sel"),
        sum(when(col("p") && col("y"), 1L).otherwise(0L)).as("tp"),
        sum(when(col("p") && !col("y"), 1L).otherwise(0L)).as("fp"))
      .select(col("grp"), col("n"), col("n_pos"), col("n_sel"),
        (expr("(2 * n_sel * 1000000 + n) DIV (2 * n)")
          .cast("double") / 1e6).as("sel_rate"),
        when(col("n_pos") === 0, lit(null).cast("double"))
          .otherwise(expr("(2 * tp * 1000000 + n_pos) DIV (2 * n_pos)")
            .cast("double") / 1e6).as("tpr"),
        when(col("n") === col("n_pos"), lit(null).cast("double"))
          .otherwise(expr(
            "(2 * fp * 1000000 + (n - n_pos)) DIV (2 * (n - n_pos))")
            .cast("double") / 1e6).as("fpr"))
      .graftCheckpoint(false) // rate rows + the gap aggregate
    val gaps = broadcast(per.agg(
      (max(col("sel_rate")) - min(col("sel_rate"))).as("dp_gap"),
      (max(col("tpr")) - min(col("tpr"))).as("tpr_gap"),
      (max(col("fpr")) - min(col("fpr"))).as("fpr_gap")))
    per.crossJoin(gaps).orderBy("grp")
  }
}
