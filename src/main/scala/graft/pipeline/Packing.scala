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
}
