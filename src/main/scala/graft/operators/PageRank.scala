package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Fixed-iteration PageRank (Page et al. 1999) as iterative DataFrame
  * algebra — the Pregel-lite shape: each iteration is ONE partial-agg
  * groupBy of edge contributions joined back to the rank relation, so
  * an iteration costs exactly one shuffle on the node key and the edge
  * relation partitions once and is reused (cached here; at 100 TB,
  * co-partition edges and ranks on src so the join is shuffle-free and
  * checkpoint every few iterations to cut the lineage).
  *
  * Cross-engine determinism: a node's incoming contribution sum is
  * order-dependent in doubles, so each contribution is rounded to
  * 12 dp and summed as DECIMAL(28,12) — exact in ANY order on any
  * engine — and each new rank is re-rounded to 12 dp. The oracle
  * (q230) replays the identical integer-decimal algebra. 12 dp keeps
  * ~6 significant digits at the fixture's 1/n ≈ 1e-5 rank floor; at
  * corpus scale raise the scale (or rescale ranks by n) so the fixed
  * point keeps resolution below 1/n.
  */
object PageRank {

  /** `edges`: (src: string, dst: string), treated as given (pre-dedup
    * them if multiplicity is not intended). Every node must have at
    * least one out-edge (symmetrize bipartite graphs — this keeps the
    * dangling-mass redistribution term out of the algebra).
    * Returns (node, rank) after `iters` damped iterations from the
    * uniform start, rank rounded to `outDp` dp. */
  def run(edges: DataFrame, iters: Int, damping: Double,
      outDp: Int = 9): DataFrame = {
    require(iters >= 1, "iters >= 1")
    val e = edges.select(col("src"), col("dst")).localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().localCheckpoint(true)
    val n = nodes.count() // metadata-scale action: one long
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("deg"))

    val init = nodes.select(col("node"),
      round(lit(1.0) / n, 12).cast(DecimalType(28, 12)).as("rank"))

    val ranks = (1 to iters).foldLeft(init) { case (r, _) =>
      val contrib = e
        .join(r.withColumnRenamed("node", "src"), "src")
        .join(outdeg, "src")
        .select(col("dst").as("node"),
          round(col("rank").cast("double") / col("deg").cast("double"), 12)
            .cast(DecimalType(28, 12)).as("c"))
      // every node has an out-edge (precondition), hence also appears
      // as a dst in the symmetrized graph — but keep the left join so
      // an isolated src-only node degrades to the teleport term
      nodes
        .join(contrib.groupBy("node").agg(sum("c").as("s")), Seq("node"), "left")
        .select(col("node"),
          round(lit(1.0 - damping) / n +
            lit(damping) * coalesce(col("s").cast("double"), lit(0.0)), 12)
            .cast(DecimalType(28, 12)).as("rank"))
        .localCheckpoint(true) // O(1) lineage across iterations
    }
    ranks.select(col("node"), round(col("rank").cast("double"), outDp).as("rank"))
  }

  /** Personalized PageRank (random walk with restart): teleport mass
    * returns only to `seeds` instead of everywhere, so ranks measure
    * proximity TO THE SEED SET — the "related items" / expansion
    * primitive. Same fixed-point decimal algebra as [[run]] (the
    * oracle unrolls it bit-for-bit); seeds are broadcast, iteration
    * cost unchanged. `seeds` must have a `node` column and be a
    * subset of the graph's nodes. */
  def personalized(edges: DataFrame, seeds: DataFrame, iters: Int,
      damping: Double, outDp: Int = 9): DataFrame = {
    require(iters >= 1, "iters >= 1")
    val e = edges.select(col("src"), col("dst")).localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .join(broadcast(seeds.select(col("node")).distinct()
        .withColumn("__seed", lit(1L))), Seq("node"), "left")
      .select(col("node"), coalesce(col("__seed"), lit(0L)).as("seed"))
      .localCheckpoint(true)
    val nSeeds = nodes.filter(col("seed") === 1L).count()
    require(nSeeds >= 1, "at least one seed must be a graph node")
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val teleport = round(col("seed").cast("double") * (1.0 - damping)
      / nSeeds, 12)
    val init = nodes.select(col("node"), col("seed"),
      round(col("seed").cast("double") / nSeeds, 12)
        .cast(DecimalType(28, 12)).as("rank"))
    val ranks = (1 to iters).foldLeft(init) { case (r, _) =>
      val contrib = e
        .join(r.select(col("node").as("src"), col("rank")), "src")
        .join(outdeg, "src")
        .select(col("dst").as("node"),
          round(col("rank").cast("double") / col("deg").cast("double"), 12)
            .cast(DecimalType(28, 12)).as("c"))
      nodes
        .join(contrib.groupBy("node").agg(sum("c").as("s")),
          Seq("node"), "left")
        .select(col("node"), col("seed"),
          round(teleport +
            lit(damping) * coalesce(col("s").cast("double"), lit(0.0)), 12)
            .cast(DecimalType(28, 12)).as("rank"))
        .localCheckpoint(true)
    }
    ranks.select(col("node"),
      round(col("rank").cast("double"), outDp).as("rank"))
  }

  /** HITS (Kleinberg 1999) on a BIPARTITE edge list (hub, auth) —
    * mutual reinforcement: good hubs point at good authorities and
    * vice versa. The natural ranking for two-sided relations
    * (buyers↔products, queries↔documents) where PageRank's
    * single-role walk loses the distinction. Sum-normalized variant
    * (L1 instead of L2): normalization totals are DECIMAL-exact, so
    * the same fixed-point rounding discipline as [[run]] applies and
    * the oracle unrolls bit-for-bit. Each half-iteration is one
    * shuffle on the receiving side's key. Returns authority scores
    * (node, auth) rounded to `outDp`. */
  def hits(edges: DataFrame, iters: Int, outDp: Int = 9): DataFrame = {
    require(iters >= 1)
    val e = edges.select(col("hub"), col("auth")).distinct()
      .localCheckpoint(true)
    val hubs = e.select(col("hub")).distinct().localCheckpoint(true)
    val nh = hubs.count()
    var h = hubs.select(col("hub"),
      round(lit(1.0) / nh, 12).cast(DecimalType(28, 12)).as("hs"))
    var a: DataFrame = null
    for (_ <- 1 to iters) {
      val araw = e.join(h, "hub")
        .groupBy("auth").agg(sum(col("hs")).as("ar")) // exact decimal
      val at = araw.agg(sum(col("ar")).as("t"))
      a = araw.crossJoin(broadcast(at))
        .select(col("auth"),
          round(col("ar").cast("double") / col("t").cast("double"), 12)
            .cast(DecimalType(28, 12)).as("as"))
        .localCheckpoint(true)
      val hraw = e.join(a, "auth")
        .groupBy("hub").agg(sum(col("as")).as("hr"))
      val ht = hraw.agg(sum(col("hr")).as("t"))
      h = hraw.crossJoin(broadcast(ht))
        .select(col("hub"),
          round(col("hr").cast("double") / col("t").cast("double"), 12)
            .cast(DecimalType(28, 12)).as("hs"))
        .localCheckpoint(true)
    }
    a.select(col("auth").as("node"),
      round(col("as").cast("double"), outDp).as("auth"))
  }
}
