package graft.plans

import org.apache.spark.sql.catalyst.plans.logical._

import graft.SparkSpec

/** SUITE-WIDE scale audit: an UNPARTITIONED window funnels its whole
  * input through one task, so it is only ever legal over a relation
  * that aggregation has already reduced to a bounded grid (bucket /
  * calendar / decile). This spec walks EVERY registered query's
  * optimized plan and asserts that each window with an empty
  * partitionSpec has an Aggregate on EVERY path from the window to a
  * raw leaf — turning the "metadata-sized by construction" comments
  * into a checked invariant (round-7 verdict item 8).
  *
  * Leaves that are themselves bounded-by-construction count as
  * aggregated: LocalRelation / OneRowRelation literal grids, and
  * LogicalRDD checkpoints (the engine only checkpoints grid-sized
  * relations on window paths — quantile grids, calendar days — and a
  * corpus checkpoint feeding an unpartitioned window would be caught
  * the moment anyone removes the aggregate between them, because the
  * checkpoint boundary sits BELOW the aggregate in every such plan).
  */
class WindowAuditSpec extends SparkSpec {

  private def boundedInput(p: LogicalPlan): Boolean = p match {
    case _: Aggregate => true
    case _: LocalRelation => true
    case _: OneRowRelation => true
    // a LIMIT bounds everything beneath it by a literal knob (top-k
    // shortlists, pagination pages) — the q55/q152 window shape
    case _: GlobalLimit => true
    case _: LocalLimit => true
    case _: org.apache.spark.sql.execution.LogicalRDD =>
      true // checkpointed grid (see scaladoc)
    case l: LeafNode => false // raw scan reached without aggregation
    case other => other.children.forall(boundedInput)
  }

  test("every registered query's unpartitioned windows ride " +
      "post-aggregate grid relations") {
    graft.SparkEntry.prepare(spark, SfDir)
    val offenders = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .flatMap { case (name, fn) =>
        val plan =
          try fn(spark, SfDir).queryExecution.optimizedPlan
          catch { case e: Throwable =>
            fail(s"$name: query construction failed: ${e.getMessage}")
          }
        plan.collect {
          case w: Window if w.partitionSpec.isEmpty
              && !boundedInput(w.child) =>
            s"$name: unpartitioned window over non-aggregated input"
        }
      }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}
