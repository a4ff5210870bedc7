package graft.search

import org.apache.spark.ml.feature.{BucketedRandomProjectionLSH, BucketedRandomProjectionLSHModel}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MLlib-backed approximate nearest neighbors: the off-the-shelf
  * alternative to the engine's own random-hyperplane LSH
  * ([[VectorSearch.annTopK]]) — `BucketedRandomProjectionLSH` buckets by
  * quantized random projections (euclidean-distance LSH family).
  *
  * Fit once on the corpus (index-build step, like everything in
  * `graft.index`), then `approxNearestNeighbors` per query. The engine's
  * own LSH path remains primary — its bucket ids are reproducible from a
  * seed on any engine (needed by the DuckDB oracle) and probe-radius
  * tunable — but the MLlib model is the drop-in for euclidean workloads.
  */
object MlVectorSearch {

  final case class Fitted(model: BucketedRandomProjectionLSHModel,
      indexed: DataFrame)

  /** Fit the LSH model and pre-transform the corpus (vec col → ml
    * Vector + hash buckets). */
  def fit(embs: DataFrame, idCol: String, vecCol: String,
      bucketLength: Double = 1.0, numHashTables: Int = 4,
      seed: Long = 42L): Fitted = {
    val withVec = embs.select(col(idCol).as("doc_id"),
      array_to_vector(col(vecCol).cast("array<double>")).as("features"))
    val lsh = new BucketedRandomProjectionLSH()
      .setInputCol("features").setOutputCol("hashes")
      .setBucketLength(bucketLength).setNumHashTables(numHashTables)
      .setSeed(seed)
    val model = lsh.fit(withVec)
    Fitted(model, model.transform(withVec).cache())
  }

  /** Approximate k nearest neighbors by euclidean distance. */
  def ann(fitted: Fitted, queryVec: Array[Float], k: Int): DataFrame =
    fitted.model.approxNearestNeighbors(fitted.indexed,
      Vectors.dense(queryVec.map(_.toDouble)), k)
      .select(col("doc_id"), col("distCol").as("dist"))
      .orderBy(col("dist").asc, col("doc_id").asc)
}
