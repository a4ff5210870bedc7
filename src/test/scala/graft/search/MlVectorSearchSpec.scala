package graft.search

import graft.{SparkSpec, Tables}
import graft.embed.DeterministicEmbedder

class MlVectorSearchSpec extends SparkSpec {

  test("MLlib BucketedRandomProjectionLSH ann finds the exact-match vector") {
    val e  = DeterministicEmbedder(64)
    val qv = e.embed("spark join merge sort window")
    val embs = Tables.embeddings(spark, SfDir)
    val fitted = MlVectorSearch.fit(embs, "vec_id", "embedding")
    val ann = MlVectorSearch.ann(fitted, qv, 5).collect()
    assert(ann.length === 5)
    assert(ann.map(_.getDouble(1)).toSeq ===
      ann.map(_.getDouble(1)).toSeq.sorted) // ascending distance
    // euclidean-nearest of unit vectors == cosine top-1: compare heads
    val cosTop = VectorSearch.topK(embs, "vec_id", "embedding", qv, 1)
      .head().getLong(0)
    assert(ann.head.getLong(0) === cosTop)
  }
}
