package graft.operators

import org.apache.spark.sql.{DataFrame, Row}

/** Driver-iterated fixed point over a bounded STATE relation.
  *
  * Iterative graph/optimization operators keep two relations: a static
  * corpus-scale one (edges — stays distributed, partitioned once) and
  * a per-iteration state one (ranks/scores/frontiers — node-sized).
  * When the state is small enough to broadcast, the broadcast build
  * already collects it to the driver every iteration; keeping the
  * state AS a driver array and re-emitting it as a literal
  * (LocalRelation) frame therefore admits no new scale risk — the
  * bound is the same `PageRank.BroadcastStateUpTo` the broadcast path
  * uses — but collapses an iteration from ~7 scheduled jobs
  * (checkpoint materializations + broadcast builds + AQE stage jobs,
  * each with fixed scheduler/planning latency) to exactly ONE: the
  * state collect. Identical expression algebra runs either way, so
  * results are bit-equal to the distributed path's.
  *
  * Beyond the bound, callers keep their co-partitioned distributed
  * loop — this helper is the small-state fast path, not a replacement.
  */
object IterState {

  /** Run `iters` rounds of `step`, carrying the state between rounds
    * as a collected row array re-emitted as a literal frame. `step`
    * receives the current state as a DataFrame (schema = `init`'s) and
    * must return the next state; its plan executes once per round via
    * the collect. Returns the final state as a literal frame. */
  def iterate(init: DataFrame, iters: Int)(step: DataFrame => DataFrame)
      : DataFrame = {
    val spark = init.sparkSession
    val schema = init.schema
    def lit0(rows: Array[Row]): DataFrame =
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
    var cur = init.collect()
    var i = 0
    while (i < iters) {
      cur = step(lit0(cur)).collect()
      i += 1
    }
    lit0(cur)
  }
}
