package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.embed.Embedder
import graft.functions.{TextFunctions, VectorFunctions}
import graft.search.TextSearch

/** Persisted search index (reference E2: RDB rows → Elasticsearch index,
  * `/root/reference/backend/process/elasticsearch_index.py:113-172`; the
  * ES index IS the reference's query engine — here it is a set of
  * partition-pruned parquet tables owned by this engine).
  *
  * Layout under `indexDir`:
  *  - `postings/`  (term, doc_id, tf, dl) partitioned by `term_bucket =
  *    pmod(hash(term), nBuckets)` — a query's terms map to a handful of
  *    buckets, so a probe scans |terms| partitions, not the corpus.
  *  - `docfreq/`   (term, df) same bucketing — BM25 idf without touching
  *    postings.
  *  - `stats/`     one row: (n_docs, avgdl).
  *  - `vectors/`   (doc_id, embedding) partitioned by `lsh_bucket` —
  *    an ANN probe reads only the buckets within the probe radius
  *    (IVF-style partition pruning; the ES `num_candidates` knob becomes
  *    the Hamming probe radius).
  *
  * Build is one pass over docs (postings + df + stats share the
  * tokenized lineage) and one over embeddings. At 100 TB both are
  * embarrassingly parallel writes; queries never scan the corpus.
  */
object SearchIndex {

  val TermBuckets = 64
  val LshBits     = 8

  /** md5-derived bucket — trivially reproducible on the driver (and in
    * any engine), unlike Spark's internal murmur3 `hash()`. */
  def termBucket(term: org.apache.spark.sql.Column) =
    pmod(TextFunctions.md5Long(term), lit(TermBuckets.toLong)).cast("int")

  /** Driver-side twin of [[termBucket]]. */
  def termBucketOf(term: String): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(term.getBytes("UTF-8"))
    val hex = d.map(b => f"$b%02x").mkString.take(15)
    (java.lang.Long.parseLong(hex, 16) % TermBuckets).toInt
  }

  /** Build/overwrite all index tables. */
  def build(docs: DataFrame, embs: DataFrame, indexDir: String,
      idCol: String = "doc_id", textCol: String = "text",
      vecIdCol: String = "vec_id", vecCol: String = "embedding",
      dim: Int = 64): Unit = {
    // repartition by the partition column first: one file per bucket dir
    // instead of numShufflePartitions tiny files per dir — faster build,
    // fewer opens per probe.
    val postings = TextSearch.buildPostings(docs, idCol, textCol)
      .withColumn("term_bucket", termBucket(col("term")))
    postings.repartition(col("term_bucket"))
      .write.mode("overwrite").partitionBy("term_bucket")
      .parquet(s"$indexDir/postings")

    val built = postings.sparkSession.read.parquet(s"$indexDir/postings")
    built.groupBy("term_bucket", "term")
      .agg(countDistinct("doc_id").cast("double").as("df"))
      .repartition(col("term_bucket"))
      .write.mode("overwrite").partitionBy("term_bucket")
      .parquet(s"$indexDir/docfreq")
    built.select("doc_id", "dl").distinct()
      .agg(count(lit(1)).cast("double").as("n_docs"),
        avg("dl").as("avgdl"))
      .write.mode("overwrite").parquet(s"$indexDir/stats")

    embs.select(col(vecIdCol).as("doc_id"), col(vecCol).as("embedding"))
      .withColumn("lsh_bucket",
        VectorFunctions.lshSignature(col("embedding"), dim, LshBits))
      .repartition(col("lsh_bucket"))
      .write.mode("overwrite").partitionBy("lsh_bucket")
      .parquet(s"$indexDir/vectors")
  }

  /** BM25 over the prebuilt index: reads only the query terms' buckets
    * (partition pruning on `term_bucket`), never re-tokenizes the corpus.
    * No driver-side count()/head() at query time — stats are a 1-row
    * broadcast relation. */
  def bm25(spark: SparkSession, indexDir: String, query: String,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val qTerms = query.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).distinct
    val buckets = qTerms.map(termBucketOf).distinct.toSeq

    val postings = spark.read.parquet(s"$indexDir/postings")
      .filter(col("term_bucket").isin(buckets: _*) &&
        col("term").isin(qTerms.toSeq: _*))
    val dfreq = spark.read.parquet(s"$indexDir/docfreq")
      .filter(col("term_bucket").isin(buckets: _*) &&
        col("term").isin(qTerms.toSeq: _*))
    val stats = spark.read.parquet(s"$indexDir/stats")

    postings
      .join(broadcast(dfreq.select("term", "df")), "term")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("term_score",
        col("idf") * col("tf") * (k1 + 1.0) /
          (col("tf") + lit(k1) *
            (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy("doc_id")
      .agg(sum("term_score").as("text_score"))
  }

  /** ANN over the prebuilt vector index: partition-pruned bucket probe
    * then exact cosine within candidates. */
  def knn(spark: SparkSession, indexDir: String, queryVec: Array[Float],
      k: Int, dim: Int = 64, probeHammingRadius: Int = 1): DataFrame = {
    val qSig = graft.search.VectorSearch.querySignature(queryVec, dim, LshBits)
    val probes = (0L until (1L << LshBits))
      .filter(bkt => java.lang.Long.bitCount(bkt ^ qSig) <= probeHammingRadius)
    val cands = spark.read.parquet(s"$indexDir/vectors")
      .filter(col("lsh_bucket").isin(probes: _*))
    cands.select(col("doc_id"),
      round(VectorFunctions.cosine(col("embedding"), typedLit(queryVec)), 6)
        .as("vec_score"))
      .orderBy(col("vec_score").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Hybrid search over the prebuilt index (reference Q3 semantics:
    * boosts 1.0/0.8, min_score, top-k). */
  def hybrid(spark: SparkSession, indexDir: String, query: String,
      embedder: Embedder, size: Int = 10, minScore: Double = 0.5,
      textBoost: Double = 1.0, vectorBoost: Double = 0.8,
      probeHammingRadius: Int = 2): DataFrame = {
    val text = bm25(spark, indexDir, query)
    val vec  = knn(spark, indexDir, embedder.embed(query),
      math.max(size * 10, 50), embedder.dim, probeHammingRadius)
    text.join(vec, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        round(coalesce(col("text_score"), lit(0.0)) * textBoost +
          coalesce(col("vec_score"), lit(0.0)) * vectorBoost, 6).as("score"))
      .filter(col("score") >= minScore)
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(size)
  }
}
