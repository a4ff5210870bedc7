package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Per-document keyword extraction: top-k terms by tf·idf — the
  * document-tagging stage of a curation pipeline (topic routing,
  * per-doc metadata for retrieval filters).
  *
  * idf = ln((N+1)/(df+1)) + 1 (the smoothed sklearn form — never zero,
  * so every term keeps a defined score). Document frequencies come from
  * the WHOLE corpus even when only a subset of documents is tagged
  * (`forDocs` prunes the tf side only — at 100 TB the df relation is
  * vocabulary-scale and reused across tagging runs). The per-doc top-k
  * is a collect over that document's distinct terms — bounded by the
  * document's vocabulary, never the corpus — sorted and sliced; scores
  * are rounded to 6 dp BEFORE ranking so the (score desc, term asc)
  * order is engine-exact. */
object Keywords {

  def topTfidfTerms(docs: DataFrame, idCol: String, textCol: String,
      k: Int, forDocs: Column = lit(true)): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"), forDocs.as("keep"),
      explode(TextFunctions.tokens(col(textCol))).as("term"))
    // `keep` is constant per doc, so adding it to the key changes no
    // groups — it just rides along to prune the scoring side below
    val tf = toks.groupBy("doc_id", "term", "keep")
      .agg(count(lit(1)).cast("double").as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    val n = docs.agg(count(lit(1)).cast("double").as("n"))
    tf.filter(col("keep")).join(df, "term").crossJoin(broadcast(n))
      .select(col("doc_id"), col("term"),
        round(col("tf") *
          (log((col("n") + 1.0) / (col("df") + 1.0)) + 1.0), 6)
          .as("score"))
      .groupBy("doc_id")
      .agg(slice(sort_array(collect_list(
        struct((col("score") * -1).as("ns"), col("term").as("t")))),
        1, k).as("top"))
      .select(col("doc_id"), posexplode(col("top")).as(Seq("rk", "t")))
      .select(col("doc_id"), (col("rk") + 1).cast("long").as("rk"),
        col("t.t").as("term"), (col("t.ns") * -1).as("score"))
  }
}
