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

  /** Metadata-filtered exact kNN (the ES `knn.filter` / FAISS
    * `IDSelector` semantics, PRE-filter form): the predicate restricts
    * the candidate set BEFORE scoring, so the result always carries
    * min(k, |matching|) rows — a post-filter over an unfiltered top-k
    * would under-fill whenever the filter is selective. Because the
    * predicate is applied directly to the scan relation, Catalyst pushes
    * it into the parquet reader (`PushedFilters`) — at 100 TB a
    * partition-keyed predicate (tenant, date slice, collection) prunes
    * whole files before a single cosine is computed. */
  def topKFiltered(embs: DataFrame, idCol: String, vecCol: String,
      queryVec: Array[Float], k: Int,
      pred: org.apache.spark.sql.Column): DataFrame =
    topK(embs.filter(pred), idCol, vecCol, queryVec, k)

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

  /** Per-dimension (min, max) over the corpus — the scalar-quantization
    * codebook. This is INDEX METADATA (2*dim doubles), computed once at
    * index-build time; the posexplode pass is the build cost, not a
    * query cost (same status as [[graft.index.IvfIndex]] centroids). */
  def quantizeStats(embs: DataFrame, vecCol: String, dim: Int)
      : (Array[Double], Array[Double]) = {
    val mm = embs
      .select(posexplode(col(vecCol)).as(Seq("pos", "v")))
      .groupBy("pos")
      .agg(min(col("v").cast("double")).as("mn"),
        max(col("v").cast("double")).as("mx"))
      .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    val mn = (0 until dim).map(i => mm(i)._1).toArray
    val mx = (0 until dim).map(i => mm(i)._2).toArray
    (mn, mx)
  }

  /** Quantize one vector to int8 with the affine codebook: each dim maps
    * through `floor((x - mn) * 255.0 / (mx - mn)) - 128` (floor, not
    * round — floor is identical across engines; round modes differ).
    * Degenerate dims (mn == mx) map to 0. */
  def quantizeVec(v: Array[Float], mn: Array[Double], mx: Array[Double])
      : Array[Long] =
    v.indices.map { i =>
      if (mx(i) == mn(i)) 0L
      else math.min(127L, math.max(-128L,
        math.floor((v(i).toDouble - mn(i)) * 255.0 / (mx(i) - mn(i))).toLong
          - 128L))
    }.toArray

  /** Int8-quantized ANN with exact rerank — the memory-bound scale path:
    * a 100 TB float32 corpus is 25 TB as int8, and the candidate scan is
    * integer dot products instead of float cosine. Top `numCandidates`
    * by quantized score (TakeOrderedAndProject — per-partition top-k,
    * no global sort), then exact cosine rerank of just those rows.
    * With numCandidates >= k/recall-slack this matches brute force on
    * realistic data (spec measures recall; the oracle pins the full
    * pipeline bit-for-bit). */
  /** Integer dot-product score of a vector column against the quantized
    * query, under codebook (mn, mx) — shared by the corpus-scan path
    * ([[quantizedTopK]]) and the IVF-cell path
    * ([[graft.index.IvfIndex.knnQuantized]]). */
  def quantizedScore(vecCol: org.apache.spark.sql.Column,
      mn: Array[Double], mx: Array[Double],
      qInt: Array[Long]): org.apache.spark.sql.Column = {
    val mnLit = typedLit(mn)
    val mxLit = typedLit(mx)
    val docQ = transform(vecCol, (x, i) => {
      val m = element_at(mnLit, (i + 1).cast("int"))
      val M = element_at(mxLit, (i + 1).cast("int"))
      when(M === m, lit(0L))
        .otherwise(least(lit(127L), greatest(lit(-128L),
          (floor((x.cast("double") - m) * lit(255.0) / (M - m))
            - lit(128L)).cast("long"))))
    })
    aggregate(zip_with(docQ, typedLit(qInt), (a, b) => a * b),
      lit(0L), (acc, v) => acc + v)
  }

  def quantizedTopK(embs: DataFrame, idCol: String, vecCol: String,
      queryVec: Array[Float], k: Int, dim: Int,
      numCandidates: Int): DataFrame = {
    val (mn, mx) = quantizeStats(embs, vecCol, dim)
    val qInt = quantizeVec(queryVec, mn, mx)
    val cands = embs
      .select(col(idCol), col(vecCol),
        quantizedScore(col(vecCol), mn, mx, qInt).as("qscore"))
      .orderBy(col("qscore").desc, col(idCol).asc)
      .limit(numCandidates)
    topK(cands, idCol, vecCol, queryVec, k)
  }

  /** Per-dimension decimal-exact corpus means — the 1-bit quantization
    * codebook (INDEX METADATA, like [[quantizeStats]]): sum of
    * round(v, 6) as DECIMAL → double divide → round 6, so the value —
    * and therefore every bit pattern cut against it — is identical in
    * any engine and any partition order (the q79 centroid discipline). */
  def meanStats(embs: DataFrame, vecCol: String, dim: Int): Array[Double] = {
    val mm = embs
      .select(posexplode(col(vecCol)).as(Seq("pos", "v")))
      .groupBy("pos")
      .agg((sum(round(col("v").cast("double"), 6)
          .cast(org.apache.spark.sql.types.DecimalType(28, 12)))
          .cast("double") / count(lit(1)).cast("double")).as("m0"))
      .select(col("pos"), round(col("m0"), 6).as("m"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    (0 until dim).map(mm).toArray
  }

  /** One 32-bit word of the binary signature: bit i set iff
    * `v[word*32 + i] > mean[word*32 + i]`. A 32-term constant-folded
    * when-chain — codegen'd integer ops, no lambda dispatch. */
  def binarySignature(vecCol: org.apache.spark.sql.Column,
      means: Array[Double], word: Int): org.apache.spark.sql.Column = {
    val lo = word * 32
    val hi = math.min(lo + 31, means.length - 1)
    (lo to hi).map { j =>
      when(element_at(vecCol, j + 1).cast("double") > lit(means(j)),
        lit(1L << (j - lo))).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Binary (1-bit) quantized ANN with exact rerank — the
    * bytes-per-vector floor of the quantization ladder (float32 → int8
    * [[quantizedTopK]] → 1 bit here, the Lucene/ES "BBQ" shape): each
    * dimension keeps only its side of the corpus mean, 32 dims per
    * word. Scoring is ASYMMETRIC, as in BBQ: the query stays float and
    * each doc contributes `Σⱼ signⱼ · (qⱼ − meanⱼ)` — computed entirely
    * from the packed sign words (a 64-branch constant-folded when-chain
    * over 2 BIGINTs; 16 bytes per vector instead of 256 float bytes; a
    * 100 TB float32 corpus is ~0.8 TB of signatures). The identical
    * vector attains the maximum possible score Σ|qⱼ − meanⱼ|, and
    * asymmetric scoring dominates symmetric Hamming on recall (the
    * query's magnitude per dimension is never thrown away). Shortlist =
    * TakeOrderedAndProject on the rounded score (id tiebreak), then
    * exact-cosine rerank of `numCandidates` rows. The oracle pins the
    * full pipeline bit-for-bit (means are decimal-exact via
    * [[meanStats]], per-word sums associate identically);
    * recall-vs-brute-force floors are the knob spec's job. */
  def binaryQuantizedTopK(embs: DataFrame, idCol: String, vecCol: String,
      queryVec: Array[Float], k: Int, dim: Int,
      numCandidates: Int): DataFrame = {
    val means = meanStats(embs, vecCol, dim)
    val nWords = (dim + 31) / 32
    // per-word partial sums, added word-ascending — the same association
    // as the oracle's list_sum-per-word + word adds
    val score = (0 until nWords).map { w =>
      val lo = w * 32
      // let-bind the packed word so the 32-term sign chain evaluates
      // once per row, not once per scored bit
      graft.functions.TextFunctions.bind(
        binarySignature(col(vecCol), means, w), bits =>
          (lo to math.min(lo + 31, dim - 1)).map { j =>
            when(shiftright(bits, j - lo).bitwiseAND(lit(1L)) === 1L,
              lit(queryVec(j).toDouble - means(j))).otherwise(lit(0.0))
          }.reduce(_ + _))
    }.reduce(_ + _)
    val cands = embs
      .select(col(idCol), col(vecCol), round(score, 6).as("bq_score"))
      .orderBy(col("bq_score").desc, col(idCol).asc)
      .limit(numCandidates)
    topK(cands, idCol, vecCol, queryVec, k)
  }

  /** Multi-vector (late-interaction) retrieval: entities are GROUPS of
    * vectors (a doc's passage embeddings, an image's patch embeddings —
    * ColBERT-style), scored by the best-matching member vector
    * (max-sim). One scan + one partial-aggregated groupBy (max is
    * algebraic: map-side combine sends one double per group per
    * partition), then TakeOrderedAndProject for the top-k — no row-level
    * shuffle of scores. */
  def maxSimTopK(embs: DataFrame, groupCol: String, vecCol: String,
      queryVec: Array[Float], k: Int): DataFrame = {
    val cos = VectorFunctions.cosine(col(vecCol), typedLit(queryVec))
    embs
      .select(col(groupCol).as("group_id"), round(cos, 6).as("s"))
      .groupBy("group_id")
      .agg(max(col("s")).as("max_sim"))
      .orderBy(col("max_sim").desc, col("group_id").asc)
      .limit(k)
  }

  /** Recall@k of an approximate result against the exact one: the ANN
    * quality metric every index knob (probe radius, nCandidates, IVF
    * nProbe) trades against latency. Both inputs are (doc_id, ...) top-k
    * frames; computed with a semi-join + counts, so it composes into an
    * evaluation pipeline without collecting either side. */
  def recallAtK(approx: DataFrame, exact: DataFrame): Double = {
    val hit = approx.select("doc_id")
      .join(exact.select("doc_id"), Seq("doc_id"), "left_semi")
      .count()
    val n = exact.count()
    if (n == 0) 1.0 else hit.toDouble / n.toDouble
  }

  /** Offline ranking-quality evaluation: NDCG@k, MRR and recall@k of a
    * system ranking against a ground-truth ranking. Both inputs are
    * (doc_id, score) top-k frames; relevance is binary truth
    * membership. The frames are metadata-scale (k rows), so the rank
    * windows here are deliberate, not a scale bug — the corpus-scale
    * work happened upstream in whichever retrieval produced the frames.
    * Composes as a plan (one broadcast-able join + one agg), so a batch
    * of query evaluations can union without collecting anything. */
  def evalRanking(system: DataFrame, truth: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def ranked(df: DataFrame, as: String): DataFrame = {
      val sc = df.columns.filterNot(_ == "doc_id").head
      df.limit(k).withColumn(as,
          row_number().over(Window.orderBy(col(sc).desc, col("doc_id").asc)))
        .select(col("doc_id"), col(as))
    }
    val idcg = (1 to k).map(i => 1.0 / (math.log(i + 1.0) / math.log(2.0))).sum
    ranked(system, "r").join(ranked(truth, "tr"), Seq("doc_id"), "left")
      .agg(
        round(coalesce(sum(when(col("tr").isNotNull,
          lit(1.0) / log2(col("r") + 1))), lit(0.0)) / idcg, 6).as("ndcg"),
        round(coalesce(lit(1.0) /
          min(when(col("tr").isNotNull, col("r"))), lit(0.0)), 6).as("mrr"),
        round(count(col("tr")).cast("double") / k, 6).as("recall"))
  }

  /** Matryoshka (MRL) two-stage retrieval: score a PREFIX of the
    * embedding (MRL-trained models pack coarse semantics into the
    * leading dimensions — Kusupati et al. 2022), shortlist by prefix
    * cosine, then exact full-dimension rerank of only the shortlist.
    * The coarse pass reads and multiplies `prefixDim/dim` of the float
    * work (16 of 64 here = 4× less compute; with the prefix stored as
    * its own parquet column the SCAN shrinks by the same factor —
    * column pruning makes the coarse pass touch none of the tail
    * bytes). Both stages are TakeOrderedAndProject (per-partition
    * top-k, no global sort); shortlist ordering is round-6 + id
    * tiebreak so the candidate SET is engine-exact and the oracle can
    * pin the whole pipeline. `shortlist` is the recall/latency knob —
    * production derives it from corpus size exactly like the
    * PQ/IVF shortlists (q186's autotune), the default mirrors ES's
    * `num_candidates = max(k*10, 50)`. */
  def matryoshkaTopK(embs: DataFrame, idCol: String, vecCol: String,
      queryVec: Array[Float], k: Int, prefixDim: Int,
      shortlist: Int): DataFrame = {
    require(prefixDim > 0 && prefixDim <= queryVec.length,
      s"prefixDim $prefixDim out of range 1..${queryVec.length}")
    val qPrefix = queryVec.take(prefixDim)
    val pCos = VectorFunctions.cosine(
      slice(col(vecCol), 1, prefixDim), typedLit(qPrefix))
    val cands = embs
      .select(col(idCol), col(vecCol), round(pCos, 6).as("prefix_score"))
      .orderBy(col("prefix_score").desc, col(idCol).asc)
      .limit(shortlist)
    topK(cands, idCol, vecCol, queryVec, k)
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
