package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.VectorFunctions

/** Engine-exact distributed k-means (Lloyd): the clustering TRAINER
  * beside the evaluators ([[ClusterEval]]) and consumers (IVF cells,
  * SemDeDup anchors). Each iteration is ONE map pass (assignment
  * against literal centroids — no join, no shuffle beyond the
  * centroid-update groupBy) exactly like a production k-means||
  * refinement step; the driver only ferries k·d doubles of centroid
  * state between iterations (the [[Coreset.kCenter]] /
  * [[graft.text.Bpe]] bounded-iteration discipline).
  *
  * Cross-engine determinism — everything that could drift is pinned:
  * initial centroids are the k smallest-id points with components
  * rounded to 6 dp; distances use d = ‖c‖² − 2·x·c with ‖c‖² a
  * sequential left-fold and x·c the left-to-right HOF dot (both equal
  * a C accumulation loop); argmin ties break to the smallest cluster
  * id via exact struct ordering; centroid updates are 6-dp-rounded
  * component sums in DECIMAL (partition-order-free) re-rounded to
  * 6 dp. An oracle unrolling the same iterations matches
  * bit-for-bit. */
object KMeans {

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Lloyd training + final readout: k clusters seeded from the k
    * smallest `idCol` points, `iters` update cycles, then one
    * assignment pass for stats. Returns one row per cluster
    * (cluster, n_vecs, inertia, c0..c3 — the first four centroid
    * components), ordered by cluster id. A cluster that empties
    * keeps its previous centroid (documented Lloyd convention). */
  def lloyd(embs: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int): DataFrame = {
    require(k >= 2 && iters >= 1)

    def assignStruct(cents: Seq[(Long, Array[Double])]): Column =
      array_min(array(cents.map { case (j, c) =>
        val cn2 = c.foldLeft(0.0)((a, x) => a + x * x)
        struct((lit(cn2) - lit(2.0) *
          VectorFunctions.dot(col(vecCol), typedLit(c))).as("d"),
          lit(j).as("j"))
      }: _*))

    // init: metadata-sized collect (k rows), mirrored by the oracle
    var cents: Seq[(Long, Array[Double])] = embs
      .filter(col(idCol) < k).select(col(idCol), col(vecCol))
      .collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(f => r6(f.toDouble)).toArray)
      .sortBy(_._1).toSeq

    for (_ <- 1 to iters) {
      val assigned = embs.select(col(vecCol),
        assignStruct(cents).getField("j").as("cluster"))
      val sums = assigned
        .select(col("cluster"), posexplode(col(vecCol)).as(Seq("pos", "v")))
        .groupBy("cluster", "pos")
        .agg(sum(round(col("v").cast("double"), 6)
          .cast(DecimalType(18, 10))).as("s"), count(lit(1)).as("n"))
        .collect() // k·d rows of centroid state — metadata by design
        .groupBy(_.getLong(0))
      cents = cents.map { case (j, old) =>
        j -> sums.get(j).fold(old) { rows =>
          val byPos = rows.map(r => r.getInt(1) ->
            r6(r.getDecimal(2).doubleValue() / r.getLong(3))).toMap
          Array.tabulate(old.length)(byPos(_))
        }
      }
    }

    val xn2 = VectorFunctions.dot(col(vecCol), col(vecCol))
    val m = embs.select(col(vecCol), assignStruct(cents).as("m"))
      .select(col("m.j").as("cluster"),
        round(xn2 + col("m.d"), 6).cast(DecimalType(28, 6)).as("dm"))
      .groupBy("cluster")
      .agg(count(lit(1)).as("n_vecs"),
        round(sum(col("dm")).cast("double"), 6).as("inertia"))
    val centDf = {
      import embs.sparkSession.implicits._
      cents.map { case (j, c) => (j, c(0), c(1), c(2), c(3)) }
        .toDF("cluster", "c0", "c1", "c2", "c3")
    }
    m.join(broadcast(centDf), "cluster").orderBy("cluster")
  }
}
