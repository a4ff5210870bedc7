package graft.operators

import org.apache.spark.sql.DataFrame

/** One knob for the iterative operators' plan-truncation checkpoints.
  *
  * Default is `localCheckpoint` — blocks live on executor storage, no
  * checkpoint directory needed, and materialization can stay LAZY
  * (fused into the next action), which the bench discipline depends
  * on. Its documented 100×-scale fragility: lose an executor mid-run
  * and its local blocks are gone, failing the job (Spark cannot
  * recompute past a truncated lineage).
  *
  * Setting `spark.graft.reliableCheckpoint=true` (plus
  * `sparkContext.setCheckpointDir` on reliable storage — HDFS/S3)
  * switches every site routed through here to a RELIABLE
  * `Dataset.checkpoint`: same lineage truncation, blocks on
  * fault-tolerant storage, executor loss survivable. The eager flag is
  * preserved — Spark supports lazy reliable checkpoints — so the job
  * structure (what fuses into which action) is identical and so are
  * all results: checkpointing is plan-level, never value-level.
  *
  * Cluster guidance: leave the default for local / single-node runs
  * and short pipelines; set the knob for long multi-iteration jobs on
  * preemptible / autoscaled executors, where the re-run cost of a lost
  * block exceeds the write-through cost of the checkpoint files.
  */
object Ckpt {

  val Key = "spark.graft.reliableCheckpoint"

  def apply(df: DataFrame, eager: Boolean): DataFrame =
    if (reliable(df)) df.checkpoint(eager)
    else df.localCheckpoint(eager)

  private def reliable(df: DataFrame): Boolean =
    df.sparkSession.conf.getOption(Key).exists(_.toBoolean)

  /** Free the storage blocks behind an (already superseded) checkpointed
    * frame. `Dataset.unpersist` is a NO-OP for checkpoint blocks — the
    * cache manager never tracked them — so iterative loops that retire a
    * generation per step (BPE merge training, frontier expansion) would
    * otherwise hold every generation until RDD GC.
    *
    * Matches ONLY the plan ROOT: a checkpoint returns a frame whose
    * analyzed plan IS a `LogicalRDD`, so the root is exactly "the
    * checkpoint that created this frame". Walking ALL `LogicalRDD`
    * leaves (the previous behavior) reached into upstream lineage and
    * dropped CALLERS' checkpoint blocks — a caller-provided input whose
    * plan embeds its own `localCheckpoint` (pervasive here via
    * `graftCheckpoint`) would lose blocks it still holds, and a
    * truncated lineage cannot recompute them. On a non-checkpoint root
    * this is a deliberate no-op (e.g. a persist-managed gen-0 frame —
    * `unpersist()` owns that cleanup). ONLY call on a frame whose
    * successor is already eagerly materialized. */
  def free(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ =>
    }

  /** `df.graftCheckpoint(eager)` — chainable form of [[Ckpt.apply]]. */
  implicit final class CkptOps(private val df: DataFrame) extends AnyVal {
    def graftCheckpoint(eager: Boolean): DataFrame = Ckpt(df, eager)
  }
}
