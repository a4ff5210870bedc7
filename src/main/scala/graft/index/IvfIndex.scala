package graft.index

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** IVF (inverted-file) vector index: k-means cells instead of LSH
  * hyperplanes. Build fits MLlib KMeans (seeded, deterministic), assigns
  * every vector to its nearest centroid, and writes the corpus
  * `partitionBy("ivf_cell")` plus a tiny `centroids/` table. A query
  * ranks centroids driver-side (index metadata, k rows), probes the
  * `nProbe` nearest cells — a partition-pruned scan — and runs exact
  * cosine inside the candidates.
  *
  * Complements [[SearchIndex]]'s LSH path: IVF adapts to the data
  * distribution (cells are balanced where the data is), LSH is
  * data-independent and engine-reproducible. Both bound the scan at
  * 100 TB; `nProbe` is the recall/latency knob (ES `num_candidates`).
  */
object IvfIndex {

  private val centroidCache =
    new java.util.concurrent.ConcurrentHashMap[String, Map[Int, Array[Double]]]()

  def build(embs: DataFrame, indexDir: String, idCol: String = "vec_id",
      vecCol: String = "embedding", nCells: Int = 16,
      seed: Long = 42L): Unit = {
    val withVec = embs.select(col(idCol).as("doc_id"),
      col(vecCol).as("embedding"),
      array_to_vector(col(vecCol).cast("array<double>")).as("features"))
    val model = new KMeans().setK(nCells).setSeed(seed)
      .setFeaturesCol("features").setPredictionCol("ivf_cell")
      .fit(withVec)
    model.transform(withVec)
      .select(col("doc_id"), col("embedding"), col("ivf_cell"))
      .repartition(col("ivf_cell"))
      .write.mode("overwrite").partitionBy("ivf_cell")
      .parquet(s"$indexDir/ivf_vectors")

    val spark = embs.sparkSession
    import spark.implicits._
    model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray.toSeq) }.toSeq
      .toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexDir/centroids")

    // SQ8 codebook: per-dim (min, max) over the build corpus — like the
    // centroids, this is frozen index metadata (incremental updates do
    // NOT refit it; out-of-range values clamp during quantization, the
    // standard scalar-quantization trade-off)
    val dim = embs.select(size(col(vecCol))).head().getInt(0)
    val (mn, mx) = graft.search.VectorSearch.quantizeStats(
      embs.select(col(vecCol)), vecCol, dim)
    Seq((mn.toSeq, mx.toSeq)).toDF("mns", "mxs")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexDir/sq_stats")
  }

  /** Incremental maintenance: assign NEW vectors to their nearest
    * EXISTING centroid and append partition-locally — centroids stay
    * fixed (the production IVF pattern: assignment is cheap and
    * append-only; re-training centroids is a separate, rarer rebuild
    * when drift degrades cell balance). Touches |batch| data, not the
    * corpus.
    *
    * Assignment is DF algebra: broadcast-crossJoin the nCells-row
    * centroid table, squared-L2 per (vector, centroid) via a zip_with
    * fold, `min_by` picks the cell (cell id as tiebreak). nCells rows
    * per new vector is the worked set — bounded by the knob. */
  def update(newEmbs: DataFrame, indexDir: String, idCol: String = "vec_id",
      vecCol: String = "embedding"): Unit = {
    val spark = newEmbs.sparkSession
    val cents = graft.Tables.loadPath(spark, s"$indexDir/centroids")
      .select(col("cell"), col("centroid"))
    val dist = aggregate(
      zip_with(col(vecCol).cast("array<double>"), col("centroid"),
        (a, b) => (a - b) * (a - b)),
      lit(0.0), (acc, x) => acc + x)
    newEmbs.select(col(idCol).as("doc_id"), col(vecCol).as("embedding"))
      .crossJoin(broadcast(cents))
      .withColumn("dist", dist)
      .groupBy("doc_id")
      .agg(
        min_by(col("cell"), struct(col("dist"), col("cell"))).as("ivf_cell"),
        first(col("embedding")).as("embedding"))
      .select(col("doc_id"), col("embedding"), col("ivf_cell"))
      .repartition(col("ivf_cell"))
      .write.mode("append").partitionBy("ivf_cell")
      .parquet(s"$indexDir/ivf_vectors")
    graft.Tables.invalidate(spark, s"$indexDir/ivf_vectors")
  }

  /** Cell-population imbalance: max(|cell|) / mean(|cell|), over the
    * FULL cell grid (an empty cell counts as 0 — assignment never fills
    * it, so it drags the mean down and shows up as drift). 1.0 is
    * perfectly balanced. One count per cell crosses the wire — index
    * metadata, not data. */
  def imbalance(spark: SparkSession, indexDir: String): Double = {
    val nCells = graft.Tables.loadPath(spark, s"$indexDir/centroids").count()
    val counts = graft.Tables.loadPath(spark, s"$indexDir/ivf_vectors")
      .groupBy("ivf_cell").count()
      .agg(max("count").cast("double").as("mx"),
        sum("count").cast("double").as("total"))
      .head()
    counts.getDouble(0) / (counts.getDouble(1) / nCells)
  }

  /** Drift-triggered retrain ([[update]] assigns to frozen centroids;
    * this is the "separate, rarer rebuild" it defers to). If
    * [[imbalance]] exceeds `threshold`, refit k-means over the CURRENT
    * index contents (self-contained — no external corpus input),
    * reassign every vector, refit the SQ8 codebook, and publish all
    * three tables via staged-directory swaps through the
    * [[graft.table.CommitStore]] primitive. Returns true iff a retrain
    * happened. At 100 TB this is one corpus pass, paid only when the
    * balance metric says the probe-cost bound has degraded. */
  def rebalance(spark: SparkSession, indexDir: String,
      threshold: Double = 3.0, seed: Long = 42L,
      store: graft.table.CommitStore = graft.table.LocalCommitStore): Boolean = {
    if (imbalance(spark, indexDir) <= threshold) return false
    import java.nio.file.Paths
    import spark.implicits._
    val nCells = graft.Tables.loadPath(spark, s"$indexDir/centroids")
      .count().toInt
    val current = graft.Tables.loadPath(spark, s"$indexDir/ivf_vectors")
      .select(col("doc_id"), col("embedding"),
        array_to_vector(col("embedding").cast("array<double>")).as("features"))
    val model = new KMeans().setK(nCells).setSeed(seed)
      .setFeaturesCol("features").setPredictionCol("ivf_cell")
      .fit(current)
    // stage everything before any swap: reads of the live dirs feed the
    // staged writes, so the live tables must stay in place until done
    model.transform(current)
      .select(col("doc_id"), col("embedding"), col("ivf_cell"))
      .repartition(col("ivf_cell"))
      .write.mode("overwrite").partitionBy("ivf_cell")
      .parquet(s"$indexDir/ivf_vectors__stage")
    model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray.toSeq) }.toSeq
      .toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$indexDir/centroids__stage")
    val dim = model.clusterCenters.head.size
    val (mn, mx) = graft.search.VectorSearch.quantizeStats(
      graft.Tables.loadPath(spark, s"$indexDir/ivf_vectors")
        .select(col("embedding")), "embedding", dim)
    Seq((mn.toSeq, mx.toSeq)).toDF("mns", "mxs")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$indexDir/sq_stats__stage")

    Seq("ivf_vectors", "centroids", "sq_stats").foreach { t =>
      store.swapDir(Paths.get(s"$indexDir/${t}__stage"),
        Paths.get(s"$indexDir/$t"))
      graft.Tables.invalidate(spark, s"$indexDir/$t")
    }
    dropMetadataCaches(indexDir)
    true
  }

  /** Drop the per-session driver-side metadata caches for `indexDir`
    * (centroids + SQ codebook) after a mutation. */
  private def dropMetadataCaches(indexDir: String): Unit = {
    centroidCache.keySet.removeIf(_.endsWith("|" + indexDir))
    sqCache.keySet.removeIf(_.endsWith("|" + indexDir))
  }

  /** Driver-side nProbe nearest cells (centroid table = index metadata,
    * nCells rows, collected once per session+index). */
  private def probeCells(spark: SparkSession, indexDir: String,
      queryVec: Array[Float], nProbe: Int): Seq[Int] = {
    val centroids = centroidCache.computeIfAbsent(
      org.apache.spark.sql.graftext.SessionUtils.uuid(spark) + "|" + indexDir,
      _ => graft.Tables.loadPath(spark, s"$indexDir/centroids")
        .collect().map(r => r.getInt(0) ->
          r.getSeq[Double](1).toArray).toMap)
    val q = queryVec.map(_.toDouble)
    centroids.toSeq
      .map { case (cell, c) =>
        val d = c.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum
        (cell, d)
      }
      .sortBy { case (cell, d) => (d, cell) }
      .take(nProbe).map(_._1)
  }

  /** Exact cosine top-k within the nProbe nearest cells. */
  def knn(spark: SparkSession, indexDir: String, queryVec: Array[Float],
      k: Int, nProbe: Int = 2): DataFrame = {
    val cells = probeCells(spark, indexDir, queryVec, nProbe)
    graft.Tables.loadPath(spark, s"$indexDir/ivf_vectors")
      .filter(col("ivf_cell").isin(cells: _*))
      .select(col("doc_id"),
        round(VectorFunctions.cosine(col("embedding"), typedLit(queryVec)), 6)
          .as("vec_score"))
      .orderBy(col("vec_score").desc, col("doc_id").asc)
      .limit(k)
  }

  /** IVF-SQ8 (the FAISS `IVF*,SQ8` shape): probe the nProbe nearest
    * cells, rank candidates by int8-quantized dot product against the
    * frozen build-time codebook, exact-cosine rerank only the top
    * `numCandidates`. At 100 TB this is the memory/bandwidth path: the
    * probed partitions scan as int8 (4× less data) and float math runs
    * on `numCandidates` rows, not the cell population. */
  def knnQuantized(spark: SparkSession, indexDir: String,
      queryVec: Array[Float], k: Int, nProbe: Int = 2,
      numCandidates: Int = 50): DataFrame = {
    val cells = probeCells(spark, indexDir, queryVec, nProbe)
    val sq = sqCache.computeIfAbsent(
      org.apache.spark.sql.graftext.SessionUtils.uuid(spark) + "|" + indexDir,
      _ => {
        val r = graft.Tables.loadPath(spark, s"$indexDir/sq_stats").head()
        (r.getSeq[Double](0).toArray, r.getSeq[Double](1).toArray)
      })
    val (mn, mx) = sq
    val qInt = graft.search.VectorSearch.quantizeVec(queryVec, mn, mx)
    val cands = graft.Tables.loadPath(spark, s"$indexDir/ivf_vectors")
      .filter(col("ivf_cell").isin(cells: _*))
      .select(col("doc_id"), col("embedding"),
        graft.search.VectorSearch.quantizedScore(
          col("embedding"), mn, mx, qInt).as("qscore"))
      .orderBy(col("qscore").desc, col("doc_id").asc)
      .limit(numCandidates)
    cands
      .select(col("doc_id"),
        round(VectorFunctions.cosine(col("embedding"), typedLit(queryVec)), 6)
          .as("vec_score"))
      .orderBy(col("vec_score").desc, col("doc_id").asc)
      .limit(k)
  }

  private val sqCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Array[Double], Array[Double])]()
}
