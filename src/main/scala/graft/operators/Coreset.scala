package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Diversity-driven data selection: greedy k-center (farthest-point
  * sampling) over an embedding column — the classic 2-approximation to
  * the k-center cover (Gonzalez 1985), used in training-data curation
  * as coreset seeding: pick the k documents that together SPAN the
  * embedding space, rather than k random ones (random sampling
  * over-picks dense regions; FPS guarantees every corpus point is
  * within the selected radius of a pick).
  *
  * Scale shape: k passes over the corpus, each a map (distance to the
  * selected set — the selected vectors ride as broadcast literals,
  * metadata like IVF centroids) + a TakeOrderedAndProject(1) argmax.
  * No window, no pairwise materialization; driver state is k vectors.
  * k is small by construction (a seeding set); for k beyond hundreds,
  * production switches to the two-round sketch variants (pick on a
  * uniform pre-sample, then one assignment pass).
  *
  * Determinism: distances are computed with a fixed left-associated
  * per-dimension sum, rounded to 6 dp, argmax ties broken by id — so
  * the selected set is identical across runs, partitionings and
  * engines (the oracle replays the same chain in SQL).
  */
object Coreset {

  /** Squared euclidean distance of `vecCol` to a literal center, as a
    * left-associated sum (engine-exact association). */
  private def sqDistLit(vecCol: String, c: Array[Double]): Column =
    c.indices.map { i =>
      val d = element_at(col(vecCol), i + 1).cast("double") - lit(c(i))
      d * d
    }.reduce(_ + _)

  /** Greedy k-center selection. Returns (rank, vec_id, dist): the
    * selection order, each pick's id, and its (rounded) distance to
    * the previously-selected set at pick time (first pick: 0.0 — it
    * is the minimum-id seed, the deterministic start). */
  def kCenter(embs: DataFrame, idCol: String, vecCol: String,
      dim: Int, k: Int): DataFrame = {
    require(k >= 1, "need k >= 1")
    val spark = embs.sparkSession
    import spark.implicits._
    val base = embs.select(col(idCol).cast("long").as("id"),
      col(vecCol).as("v"))
    // deterministic seed: minimum id
    val first = base.orderBy(col("id").asc).limit(1).head()
    var selected = Vector(
      (first.getLong(0), vecOf(first, 1, dim), 0.0))
    var exhausted = false
    while (selected.length < k && !exhausted) {
      val dists = selected.map { case (_, c, _) => sqDistLit("v", c) }
      val minDist = round(
        if (dists.length == 1) dists.head else least(dists: _*), 6)
      val ids = selected.map(_._1)
      val next = base
        .filter(!col("id").isin(ids: _*))
        .select(col("id"), col("v"), minDist.as("d"))
        .orderBy(col("d").desc, col("id").asc)
        .limit(1)
        .take(1)
      if (next.isEmpty) exhausted = true // k > corpus: return what exists
      else selected :+= ((next(0).getLong(0), vecOf(next(0), 1, dim),
        next(0).getDouble(2)))
    }
    selected.zipWithIndex
      .map { case ((id, _, d), i) => (i + 1, id, d) }
      .toDF("rank", "vec_id", "dist")
  }

  /** Read a float/double array cell as rounded-free doubles. */
  private def vecOf(r: org.apache.spark.sql.Row, at: Int,
      dim: Int): Array[Double] = {
    val s = r.getSeq[Any](at)
    require(s.length == dim, s"vector of dim ${s.length}, expected $dim")
    s.map {
      case f: Float => f.toDouble
      case d: Double => d
    }.toArray
  }

  /** Assignment pass: each corpus row labeled with its nearest selected
    * center (and the distance) — turns the k picks into a clustering /
    * coverage-radius report. One broadcast-literal map over the corpus. */
  def assign(embs: DataFrame, idCol: String, vecCol: String,
      centers: Seq[(Long, Array[Double])]): DataFrame = {
    require(centers.nonEmpty, "need at least one center")
    val pairs = centers.map { case (cid, c) =>
      struct(round(sqDistLit(vecCol, c), 6).as("d"),
        lit(cid).as("center_id"))
    }
    val best = array_min(array(pairs: _*))
    embs.select(col(idCol), best.getField("center_id").as("center_id"),
      best.getField("d").as("dist"))
  }
}
