package graft.operators

import graft.operators.Ckpt.CkptOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.{TextFunctions, VectorFunctions}

/** Clustering-quality evaluation over an embedding column — the
  * "are my labels/clusters real structure?" diagnostic a curation
  * pipeline runs after k-means/IVF training or on labeled data
  * (complementing q194's anisotropy profile, which is label-free).
  *
  * Uses the CENTROID silhouette (the medoid-free simplification): for
  * each point, a = squared distance to its own label's centroid, b =
  * the minimum over other labels' centroids; s = (b − a)/max(a, b).
  * Full silhouette is O(n²) pairwise; the centroid form is one
  * broadcast-literal map pass — the only version that exists at
  * 100 TB, and the one sklearn's davies_bouldin/calinski users
  * actually reach for at scale.
  *
  * Scale shape: centroids are exact-decimal index metadata
  * ([[VectorFunctions.centroids]], one partial-aggregated pass);
  * per-row distances are a fixed left-associated sum against literal
  * centroids (codegen'd arithmetic, no join, no shuffle); the rollup
  * is a |labels|-cardinality groupBy with map-side combine. Every
  * value is rounded to 6 dp at the same points in both engines.
  */
object ClusterEval {

  /** Per-label centroid silhouette: (label, n_vecs, mean_silhouette).
    */
  def centroidSilhouette(embs: DataFrame, labelCol: String,
      vecCol: String, dim: Int): DataFrame = {
    val cents: Seq[(Int, Array[Double])] =
      VectorFunctions.centroids(embs, labelCol, vecCol)
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
        .sortBy(_._1)
        .toSeq
    require(cents.length >= 2, "silhouette needs at least two labels")
    // distance of the row vector to each centroid, label-ascending,
    // each a left-assoc per-dim sum rounded to 6
    val dists = array(cents.map { case (_, c) =>
      round(c.indices.map { i =>
        val d = element_at(col(vecCol), i + 1).cast("double") - lit(c(i))
        d * d
      }.reduce(_ + _), 6)
    }: _*)
    val labels = typedLit(cents.map(_._1).toArray)
    // bind the distance array once; a = own-centroid dist, b = min other
    val s = TextFunctions.bind(dists, arr => {
      val own = element_at(arr,
        array_position(labels, col(labelCol).cast("int")).cast("int"))
      val other = array_min(filter(
        transform(sequence(lit(0), lit(cents.length - 1)),
          j => when(element_at(labels, j + 1) === col(labelCol)
            .cast("int"), lit(null)).otherwise(element_at(arr, j + 1))),
        x => x.isNotNull))
      round(when(greatest(own, other) === 0.0, lit(0.0))
        .otherwise((other - own) / greatest(own, other)), 6)
    })
    embs
      .select(col(labelCol).cast("int").as("label"), s.as("s"))
      .groupBy("label")
      .agg(
        count(lit(1)).as("n_vecs"),
        round(sum(col("s").cast(DecimalType(18, 10))).cast("double")
          / count(lit(1)), 6).as("mean_silhouette"))
      .orderBy("label")
  }

  /** kNN label-noise audit (Confident-Learning-lite): for each probe
    * point, the fraction of its k cosine-nearest neighbours that
    * DISAGREE with its label, plus the neighbourhood's majority label
    * — the candidate list for relabeling ("this point sits inside
    * another class's cluster"). The silhouette above scores CLASSES;
    * this scores POINTS.
    *
    * Scale shape: probes are a broadcast slice (audits sample, they
    * don't sweep); scoring is one map pass over the corpus per
    * partition with the codegen'd cosine; per-probe top-k is a
    * k-bounded window over |probes| partitions. At full-corpus audit
    * scale the same scoring runs through the IVF-pruned path instead
    * of the brute crossJoin — the join shape is the knob, the
    * disagreement algebra is unchanged. Returns (vec_id, label,
    * n_neighbors, n_disagree, noise_frac, majority_label). */
  def knnLabelNoise(embs: DataFrame, idCol: String, vecCol: String,
      labelCol: String, probePred: Column, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val probes = broadcast(embs.filter(probePred)
      .select(col(idCol).as("qid"), col(vecCol).as("qv"),
        col(labelCol).as("qlabel")))
    val scored = embs.crossJoin(probes)
      .filter(col(idCol) =!= col("qid"))
      .select(col("qid"), col("qlabel"), col(labelCol).as("nlabel"),
        col(idCol).as("nid"),
        round(VectorFunctions.cosine(col(vecCol), col("qv")), 6).as("s"))
    val w = Window.partitionBy("qid")
      .orderBy(col("s").desc, col("nid").asc)
    val nb = scored.withColumn("r", row_number().over(w))
      .filter(col("r") <= k)
      .graftCheckpoint(true) // |probes|·k rows; feeds two aggregates
    val ag = nb.groupBy("qid", "qlabel")
      .agg(count(lit(1)).as("n_neighbors"),
        sum(when(col("nlabel") =!= col("qlabel"), 1L).otherwise(0L))
          .as("n_disagree"))
    val maj = nb.groupBy("qid", "nlabel").agg(count(lit(1)).as("c"))
      .groupBy("qid")
      .agg(min(struct((-col("c")).as("nc"), col("nlabel").as("l"))).as("m"))
      .select(col("qid"), col("m.l").as("majority_label"))
    ag.join(maj, "qid")
      .select(col("qid").as(idCol), col("qlabel").as(labelCol),
        col("n_neighbors"), col("n_disagree"),
        round(col("n_disagree").cast("double")
          / col("n_neighbors").cast("double"), 6).as("noise_frac"),
        col("majority_label"))
      .orderBy(col("noise_frac").desc, col(idCol))
  }
}
