package graft.operators

import graft.operators.Ckpt.CkptOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting over an undirected edge list — the
  * graph-quality metric behind clustering-coefficient checks on
  * similarity/link graphs (e.g. how clique-like the near-dup graph is
  * before choosing a dedup keep-policy).
  *
  * Algorithm: compact-forward (Latapy 2008) on canonically oriented
  * edges (a < b): wedges come from joining the edge list with itself on
  * the middle vertex, and a wedge closes iff its (low, high) endpoint
  * pair is itself an edge — checked with a semi-join, so each triangle
  * x < y < z is counted exactly once and no candidate set is ever
  * collected.
  *
  * Scale shape: two shuffles (join on middle vertex, semi-join on the
  * endpoint pair), both partial-agg friendly. Wedge count is
  * Σ_v deg⁻(v)·deg⁺(v) — at 100 TB the standard refinement is to orient
  * edges by (degree, id) instead of id so hubs get out-degree ≈ 0; with
  * id orientation the shape is identical, only the orientation key
  * changes (a one-line swap documented here rather than built, since the
  * degree relation is itself one groupBy). */
object Triangles {

  /** Count triangles in `edges` (columns `a`, `b`, canonical a < b).
    * Returns one row: (n_wedges, n_triangles, closure_rate). */
  def count(edges: DataFrame): DataFrame = {
    // the edge relation feeds THREE plan legs (both wedge sides + the
    // closure probe); materialize it once so an expensive upstream
    // (e.g. a pairwise-similarity join) isn't re-evaluated per leg —
    // same rationale as the localCheckpoint in Dedup.nearDupClusters.
    // distinct first: the semi-join probe is naturally idempotent but
    // duplicate (a,b) rows would multiply wedge AND triangle counts
    val e = edges.select(col("a"), col("b")).distinct().graftCheckpoint(true)
    val wedges = e.toDF("x", "y")
      .join(e.toDF("y", "z"), "y")
      .select(col("x"), col("y"), col("z"))
    // ONE wedge pass for both counts: the closure probe rides as a
    // left-join match flag instead of a separate semi-joined leg (e is
    // distinct, so a (x,z) left join matches at most once and the
    // flag-sum ≡ the semi-join count). The old two-leg shape ran the
    // wedge join twice — exchange reuse shares the join INPUTS but not
    // the join compute itself.
    wedges
      .join(e.toDF("x", "z").withColumn("__hit", lit(1L)),
        Seq("x", "z"), "left")
      .agg(org.apache.spark.sql.functions.count(lit(1))
          .cast("long").as("n_wedges"),
        // outer coalesce: sum over ZERO wedges is null, the old
        // two-leg shape's count was 0
        coalesce(sum(coalesce(col("__hit"), lit(0L))), lit(0L))
          .cast("long").as("n_triangles"))
      .select(col("n_wedges"), col("n_triangles"),
        when(col("n_wedges") === 0, 0.0)
          .otherwise(round(col("n_triangles").cast("double") /
            col("n_wedges").cast("double"), 6)).as("closure_rate"))
  }

  /** Per-vertex local clustering coefficient
    * cc(v) = 2·T(v) / (deg(v)·(deg(v)−1)) — [[count]]'s global closure
    * rate localized: which vertices sit in cliques vs stars. Same
    * compact-forward wedge/semi-join shape; each closed triangle
    * (x < y < z) credits ALL THREE corners via one explode. Degree-1
    * vertices have an undefined coefficient and report 0 (the
    * convention that keeps corpus averages finite). Returns
    * (v, deg, n_tri, lcc) — exact integer counts, one rounded
    * division. */
  def localClustering(edges: DataFrame): DataFrame = {
    val e = edges.select(col("a"), col("b")).distinct().graftCheckpoint(true)
    val deg = e.select(col("a").as("v"))
      .unionAll(e.select(col("b").as("v")))
      .groupBy("v")
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("deg"))
    val tri = e.toDF("x", "y")
      .join(e.toDF("y", "z"), "y")
      .join(e.toDF("x", "z"), Seq("x", "z"), "left_semi")
      .select(explode(array(col("x"), col("y"), col("z"))).as("v"))
      .groupBy("v")
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("n_tri"))
    deg.join(tri, Seq("v"), "left")
      .select(col("v"), col("deg"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        when(col("deg") < 2, 0.0)
          .otherwise(round(lit(2.0) * coalesce(col("n_tri"), lit(0L))
              .cast("double") /
            (col("deg").cast("double") * (col("deg").cast("double") - 1.0)),
            6)).as("lcc"))
  }
}
