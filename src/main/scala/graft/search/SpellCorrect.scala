package graft.search

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus-driven spelling correction ("did you mean") via the
  * symmetric-delete scheme (SymSpell; ES's term suggester serves the
  * same need): every vocabulary term is indexed under all of its
  * single-character DELETES (plus itself), and a query term probes
  * with ITS deletes — a match implies candidate edit distance ≤ 2,
  * verified with exact Levenshtein ≤ 1. Completeness for distance 1:
  * an equal pair meets at the 0-delete, an insert/delete pair meets
  * at the inserted position's delete, a substitution pair meets where
  * both drop the differing character.
  *
  * Scale shape: the delete index is VOCABULARY-sized (token types ×
  * (len+1) variants), not corpus-sized — millions of rows at 100 TB,
  * built with one token-count aggregation. Query terms are a handful:
  * their delete table broadcasts, so lookup is a broadcast-hash probe
  * of the index with no shuffle of the vocabulary. Ranking candidates
  * needs no window: the verified candidate set per query is tiny (a
  * term's edit-distance-1 neighborhood), returned whole.
  */
object SpellCorrect {

  /** All single-character deletes of `colName`, plus the term itself,
    * deduped. (SQL-expression form: `substring` with computed offsets
    * has no literal-only Column API.) */
  private def deletesExpr(colName: String): org.apache.spark.sql.Column =
    expr(s"""array_distinct(concat(array($colName),
      transform(sequence(1, length($colName)),
        i -> concat(substring($colName, 1, i - 1),
                    substring($colName, i + 1, length($colName))))))""")

  /** Vocabulary (term, freq) of the corpus. */
  def vocabulary(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("freq"))

  /** Correction candidates for each query term: (query, term, dist,
    * freq) with Levenshtein dist ≤ 1, deterministic total order. */
  def correct(docs: DataFrame, textCol: String,
      queries: Seq[String]): DataFrame = {
    require(queries.nonEmpty && queries.forall(_.nonEmpty),
      "query terms must be non-empty (sequence(1, length) of an empty " +
        "string is an invalid range)")
    val spark: SparkSession = docs.sparkSession
    import spark.implicits._
    val vd = vocabulary(docs, textCol)
      .select(col("term"), col("freq"),
        explode(deletesExpr("term")).as("del"))
    val qd = queries.toDF("query")
      .select(col("query"), explode(deletesExpr("query")).as("del"))
    vd.join(broadcast(qd), "del")
      .select(col("query"), col("term"), col("freq"))
      .distinct()
      .withColumn("dist", levenshtein(col("query"), col("term")))
      .filter(col("dist") <= 1)
      .select(col("query"), col("term"), col("dist"), col("freq"))
      .orderBy(col("query"), col("dist"), col("freq").desc, col("term"))
  }
}
