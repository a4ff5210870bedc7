package graft.embed

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Portable (md5-bucketed) twin of the [[MlEmbedder]] TF-IDF pipeline:
  * identical math — per-doc bucket term frequencies, MLlib's idf
  * `ln((m+1)/(df+1))`, L2 normalization — with md5 bucket hashing
  * instead of HashingTF's murmur3, so an external SQL engine can
  * reproduce every weight exactly and the embedding computation is
  * oracle-checked end-to-end (q57). The twin relationship is
  * structural (same formula, stage for stage) — bucket contents differ
  * because the hashes differ; the MLlib path's own correctness is
  * pinned by MlEmbedderSpec (corpus-vs-query consistency).
  *
  * Scale shape: tf is one hash-shuffle groupBy (map-side combinable);
  * idf is a `dim`-bounded aggregate broadcast back; normalization is a
  * per-doc window over ≤ dim rows. No collect exceeds `dim` elements
  * per doc.
  */
object TfIdfEmbed {

  /** Sparse normalized TF-IDF: (doc_id, bucket, w) rows, w L2-normalized
    * per doc. Docs with zero tokens emit no rows. */
  def sparseEmbed(docs: DataFrame, idCol: String, textCol: String,
      dim: Int = 64): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(TextFunctions.tokens(col(textCol))).as("tok"))
    val tf = toks
      .groupBy(col("doc_id"),
        pmod(TextFunctions.md5Long(col("tok")), lit(dim.toLong)).as("bucket"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val m = docs.agg(count(lit(1)).cast("double").as("m"))
    val dfreq = tf.groupBy("bucket")
      .agg(count(lit(1)).cast("double").as("df"))
    val raw = tf
      .join(broadcast(dfreq), "bucket") // ≤ dim rows
      .crossJoin(broadcast(m))          // 1 row
      .select(col("doc_id"), col("bucket"),
        (col("tf") * log((col("m") + 1.0) / (col("df") + 1.0))).as("wr"))
    val norm = sqrt(sum(col("wr") * col("wr"))
      .over(Window.partitionBy("doc_id")))
    raw.select(col("doc_id"), col("bucket"), col("wr"),
        norm.as("l2_raw"))
      .select(col("doc_id"), col("bucket"),
        (col("wr") / col("l2_raw")).as("w"), col("l2_raw"))
  }

  /** Per-doc digest of the full embedding, built from exactly-portable
    * pieces: `nnz` (integer), the pre-normalization L2 norm rounded to
    * 4dp, and an md5 signature over the bucket:weight pairs with weights
    * integer-quantized at 1e4 (float FORMATTING is engine-specific;
    * quantized integers are not). Pins tokenize → bucket → tf → idf →
    * normalize end-to-end. */
  def profile(docs: DataFrame, idCol: String, textCol: String,
      dim: Int = 64): DataFrame =
    sparseEmbed(docs, idCol, textCol, dim)
      .select(col("doc_id"), col("bucket"), col("l2_raw"),
        round(col("w") * 10000.0).cast("long").as("iw"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("nnz"),
        round(first(col("l2_raw")), 4).as("l2_raw"),
        md5(concat_ws(",", transform(
          sort_array(collect_list(struct(col("bucket"), col("iw")))),
          x => concat(x("bucket"), lit(":"), x("iw"))))).as("sig"))
}
