package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Training-sequence packing — the "concat and chunk" stage between a
  * curated corpus and a pretraining data loader (GPT-style: documents
  * are concatenated in a fixed deterministic order and sliced into
  * fixed-length token sequences; attention/loss masking handles the
  * document boundaries inside a sequence).
  *
  * Scale shape: documents are first hashed into `nShards` independent
  * output shards (deterministic md5, same salt ⇒ same epoch layout), and
  * ALL ordering state — the running token offset — is per-shard: the
  * window is `partitionBy(shard)`, so shards pack in parallel and no
  * global sort or global running sum ever exists. At 100 TB you pick
  * nShards so one shard ≈ one output file (thousands of shards), which
  * is exactly how production packers lay out epochs; the within-shard
  * window then sorts file-sized slices, not the corpus.
  */
object Packing {

  /** Per-document packed layout: shard, deterministic position key,
    * token count, start offset in the shard's concatenated token
    * stream, and the first/last sequence index the document lands in. */
  def packedLayout(docs: DataFrame, idCol: String, textCol: String,
      nShards: Int, seqLen: Int, salt: String = "epoch0"): DataFrame = {
    val id = col(idCol).cast("string")
    val base = docs.select(
      col(idCol).as("doc_id"),
      pmod(TextFunctions.md5Long(concat(lit(salt + "|"), id)),
        lit(nShards.toLong)).as("shard"),
      TextFunctions.md5Long(id).as("k"),
      TextFunctions.tokenCount(col(textCol)).as("n_tokens"))
    val w = Window.partitionBy("shard").orderBy(col("k"), col("doc_id"))
    base
      .withColumn("start_off",
        coalesce(sum(col("n_tokens")).over(
          w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      // offsets are non-negative, so `div` == floor — and stays in LONG
      // arithmetic (exact past 2^53, where double floor would not be)
      .withColumn("seq_first", expr(s"start_off div $seqLen"))
      .withColumn("seq_last",
        when(col("n_tokens") > 0,
          expr(s"(start_off + n_tokens - 1) div $seqLen"))
          .otherwise(expr(s"start_off div $seqLen")))
  }

  /** Per-shard packing statistics: document/token totals, emitted
    * sequence count, how many documents straddle a sequence boundary,
    * and fill efficiency of the emitted sequences (the final partial
    * sequence is padded — efficiency is the padding complement). */
  def packStats(docs: DataFrame, idCol: String, textCol: String,
      nShards: Int, seqLen: Int, salt: String = "epoch0"): DataFrame =
    packedLayout(docs, idCol, textCol, nShards, seqLen, salt)
      .groupBy("shard")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        ceil(sum(col("n_tokens")).cast("double") / seqLen).cast("long")
          .as("n_seqs"),
        sum(when(col("seq_last") > col("seq_first"), 1L).otherwise(0L))
          .as("n_split_docs"))
      .withColumn("efficiency",
        round(col("total_tokens").cast("double") /
          (col("n_seqs") * lit(seqLen.toLong)).cast("double"), 6))
      .orderBy("shard")

  /** Padding-waste profile of LENGTH-BUCKETED batching — the inference/
    * SFT counterpart of [[packStats]] (no concat: each example keeps
    * its boundary and is padded up to its bucket's length). Buckets
    * are multiples of `granularity`, capped at `maxLen` (longer docs
    * truncate, reported separately). Per bucket: example count, real
    * vs padded token totals, and waste share; plus the whole-corpus
    * `pad-to-max` strategy as bucket −1, so one result quantifies what
    * bucketing saves over naive max-length padding. ONE scan, one
    * fixed-cardinality groupBy (≤ maxLen/granularity + 1 groups) —
    * partial aggregation does all the work map-side; no windows, no
    * per-doc state. */
  def paddingWaste(docs: DataFrame, textCol: String, granularity: Int,
      maxLen: Int): DataFrame = {
    require(granularity >= 1 && maxLen >= granularity,
      s"need 1 <= granularity <= maxLen, got $granularity/$maxLen")
    val n = TextFunctions.tokenCount(col(textCol))
    val eff = least(n, lit(maxLen.toLong)) // tokens that survive truncation
    val bucketLen = least(
      (ceil(eff.cast("double") / granularity) * granularity).cast("long"),
      lit(maxLen.toLong))
    val base = docs.select(
      eff.as("n_tok"),
      greatest(bucketLen, lit(granularity.toLong)).as("bucket"),
      (n > maxLen).cast("long").as("truncated"))
    val perBucket = base.groupBy("bucket")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("real_tokens"),
        sum(col("truncated")).as("n_truncated"))
      .withColumn("padded_tokens", col("n_docs") * col("bucket"))
    val padToMax = base.agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("real_tokens"),
        sum(col("truncated")).as("n_truncated"))
      .select(lit(-1L).as("bucket"), col("n_docs"), col("real_tokens"),
        col("n_truncated"),
        (col("n_docs") * maxLen.toLong).as("padded_tokens"))
    perBucket.select("bucket", "n_docs", "real_tokens", "n_truncated",
        "padded_tokens")
      .unionAll(padToMax)
      // ppm by LONG division, then one exact double divide — a ratio of
      // integers can land exactly on a round-6 half-boundary (8078/32000
      // = .2524375), where HALF_UP vs float-repr rounding diverges
      // across engines; truncating integer ppm is engine-exact
      .withColumn("waste",
        expr("((padded_tokens - real_tokens) * 1000000) div padded_tokens")
          .cast("double") / lit(1000000.0))
      .orderBy("bucket")
  }
}
