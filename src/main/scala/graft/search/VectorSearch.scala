package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Dense-vector kNN (reference Q2: ES `knn` over a 1024-dim
  * `dense_vector`, k, `num_candidates = max(k*10, 50)`,
  * `/root/reference/backend/process/elasticsearch_index.py:261-277`).
  *
  * Two paths:
  *  - [[topK]] — exact brute force. Cosine is computed with codegen'd
  *    higher-order functions; `orderBy(desc).limit(k)` plans as
  *    `TakeOrderedAndProject`: each partition keeps only its local top-k,
  *    the driver merges k*numPartitions rows. No global sort, no shuffle
  *    of the scored table. Correctness baseline at any scale, O(n) scan.
  *  - [[annTopK]] — LSH-bucketed: rows are pre-bucketed by a
  *    random-hyperplane signature; a query probes only buckets within
  *    `probeHammingRadius` of its own signature. At 100 TB the bucketed
  *    table is written `partitionBy("lsh_bucket")` so a probe is a
  *    partition-pruned scan, mirroring ES's `num_candidates`
  *    recall/latency knob.
  */
object VectorSearch {

  /** Exact cosine top-k against a literal query vector. */
  def topK(embs: DataFrame, idCol: String, vecCol: String,
      queryVec: Array[Float], k: Int): DataFrame = {
    val cos = VectorFunctions.cosine(col(vecCol), typedLit(queryVec))
    embs
      .select(col(idCol).as("doc_id"), round(cos, 6).as("vec_score"))
      .orderBy(col("vec_score").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Bucket a vector table by LSH signature (index-build step). */
  def withLshBucket(embs: DataFrame, vecCol: String, dim: Int,
      nBits: Int = 8, seed: Long = 42L): DataFrame =
    embs.withColumn("lsh_bucket",
      VectorFunctions.lshSignature(col(vecCol), dim, nBits, seed))

  /** Approximate top-k: probe buckets with signature hamming-distance ≤
    * radius of the query's signature, then exact cosine within the
    * candidate set. radius=nBits degenerates to exact. */
  def annTopK(embs: DataFrame, idCol: String, vecCol: String,
      queryVec: Array[Float], k: Int, dim: Int, nBits: Int = 8,
      probeHammingRadius: Int = 1, seed: Long = 42L): DataFrame = {
    val bucketed = withLshBucket(embs, vecCol, dim, nBits, seed)
    val qSig = querySignature(queryVec, dim, nBits, seed)
    val probes = (0L until (1L << nBits))
      .filter(b => java.lang.Long.bitCount(b ^ qSig) <= probeHammingRadius)
    topK(bucketed.filter(col("lsh_bucket").isin(probes: _*)),
      idCol, vecCol, queryVec, k)
  }

  /** Driver-side signature of the query vector (same hyperplanes). */
  def querySignature(v: Array[Float], dim: Int, nBits: Int,
      seed: Long = 42L): Long = {
    val planes = graft.functions.Hyperplanes.planes(dim, nBits, seed)
    planes.zipWithIndex.foldLeft(0L) { case (acc, (p, i)) =>
      val proj = (0 until dim).map(j => v(j) * p(j)).sum
      if (proj > 0.0) acc | (1L << i) else acc
    }
  }
}
