// Same private[sql]-bridge rationale as CosineSimilarityExpr.
package org.apache.spark.sql.graftext

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.classic.ColumnNodeToExpressionConverter
import org.apache.spark.sql.classic.ExpressionUtils.column

import graft.functions.{TextFunctions, VectorFunctions}
import graft.text.TextAnalysis

/** SQL surface for the engine's functions. Two ways in:
  *  - config: `spark.sql.extensions=org.apache.spark.sql.graftext.GraftExtensions`
  *  - programmatic: `GraftFunctions.register(spark)` on a live session.
  * After either, `spark.sql("SELECT graft_cosine(a, b) ...")` etc. work —
  * the reference's users talk SQL to Postgres; ours can talk SQL to Spark.
  */
object GraftFunctions {

  private def info(name: String, usage: String) =
    new ExpressionInfo(getClass.getName, null, name, usage, "")

  /** EAGER Column→Expression conversion. `ExpressionUtils.expression`
    * returns a lazy ColumnNodeExpression wrapper that the analyzer
    * treats as a leaf — nested unresolved functions inside it never get
    * resolved when returned from a FunctionRegistry builder. Converting
    * the node up front yields a plain catalyst tree the analyzer
    * resolves normally. */
  private def expression(c: org.apache.spark.sql.Column): Expression =
    ColumnNodeToExpressionConverter(c.node)

  /** Arity + literal-argument validation: a wrong argument count or a
    * non-foldable value where a constant knob is required (nBits, n, dim)
    * must be a proper AnalysisException naming the signature, not an
    * IndexOutOfBounds / eval-on-unresolved crash from inside the
    * builder. */
  private def checkArity(name: String, sig: String, cs: Seq[Expression],
      n: Int): Unit =
    if (cs.length != n)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "_LEGACY_ERROR_TEMP_3088",
        messageParameters = Map("msg" ->
          s"$name expects $n argument(s): $sig; got ${cs.length}"))

  private def litInt(name: String, sig: String, cs: Seq[Expression],
      i: Int): Int = {
    val e = cs(i)
    if (!e.foldable || !e.resolved)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "_LEGACY_ERROR_TEMP_3088",
        messageParameters = Map("msg" ->
          s"$name: argument ${i + 1} of $sig must be an integer literal"))
    e.eval() match {
      case x: Number => x.intValue()
      case other => throw new org.apache.spark.sql.AnalysisException(
        errorClass = "_LEGACY_ERROR_TEMP_3088",
        messageParameters = Map("msg" ->
          (s"$name: argument ${i + 1} of $sig must be an integer literal, " +
            s"got $other")))
    }
  }

  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_cosine"),
      info("graft_cosine", "_FUNC_(a, b) - cosine similarity of two float vectors"),
      (cs: Seq[Expression]) => {
        checkArity("graft_cosine", "(a, b)", cs, 2)
        CosineSimilarityExpr(cs(0), cs(1))
      }),
    (FunctionIdentifier("graft_tokens"),
      info("graft_tokens", "_FUNC_(text) - lowercase alnum tokens"),
      (cs: Seq[Expression]) => {
        checkArity("graft_tokens", "(text)", cs, 1)
        expression(TextFunctions.tokens(column(cs(0))))
      }),
    (FunctionIdentifier("graft_md5long"),
      info("graft_md5long", "_FUNC_(s) - stable 60-bit md5-derived hash"),
      (cs: Seq[Expression]) => {
        checkArity("graft_md5long", "(s)", cs, 1)
        expression(TextFunctions.md5Long(column(cs(0))))
      }),
    (FunctionIdentifier("graft_quality"),
      info("graft_quality", "_FUNC_(text) - heuristic quality score in [0,1]"),
      (cs: Seq[Expression]) => {
        checkArity("graft_quality", "(text)", cs, 1)
        expression(TextAnalysis.qualityScore(column(cs(0))))
      }),
    (FunctionIdentifier("graft_lang_id"),
      info("graft_lang_id", "_FUNC_(text) - stopword-ratio language id"),
      (cs: Seq[Expression]) => {
        checkArity("graft_lang_id", "(text)", cs, 1)
        expression(TextAnalysis.langId(column(cs(0))))
      }),
    (FunctionIdentifier("graft_fingerprint"),
      info("graft_fingerprint", "_FUNC_(text) - rolling-hash document fingerprint"),
      (cs: Seq[Expression]) => {
        checkArity("graft_fingerprint", "(text)", cs, 1)
        expression(TextAnalysis.fingerprint(column(cs(0))))
      }),
    (FunctionIdentifier("graft_lsh_bucket"),
      info("graft_lsh_bucket",
        "_FUNC_(vec, dim, nBits) - random-hyperplane LSH signature"),
      (cs: Seq[Expression]) => {
        checkArity("graft_lsh_bucket", "(vec, dim, nBits)", cs, 3)
        val dim   = litInt("graft_lsh_bucket", "(vec, dim, nBits)", cs, 1)
        val nBits = litInt("graft_lsh_bucket", "(vec, dim, nBits)", cs, 2)
        expression(VectorFunctions.lshSignature(column(cs(0)), dim, nBits))
      }),
    (FunctionIdentifier("graft_simhash"),
      info("graft_simhash",
        "_FUNC_(hashes, nBits) - SimHash signature over array<long> token hashes"),
      (cs: Seq[Expression]) => {
        checkArity("graft_simhash", "(hashes, nBits)", cs, 2)
        SimHashExpr(cs(0), litInt("graft_simhash", "(hashes, nBits)", cs, 1))
      }),
    (FunctionIdentifier("graft_shingles"),
      info("graft_shingles", "_FUNC_(tokens, n) - word n-gram shingles"),
      (cs: Seq[Expression]) => {
        checkArity("graft_shingles", "(tokens, n)", cs, 2)
        ShinglesExpr(cs(0), litInt("graft_shingles", "(tokens, n)", cs, 1))
      }),
    (FunctionIdentifier("graft_pairs_asc"),
      info("graft_pairs_asc",
        "_FUNC_(xs) - all ascending (i<j) element pairs as array<struct<_1,_2>>"),
      (cs: Seq[Expression]) => {
        checkArity("graft_pairs_asc", "(xs)", cs, 1)
        PairsAscExpr(cs(0))
      }),
    (FunctionIdentifier("graft_kmv_distinct"),
      info("graft_kmv_distinct",
        "_FUNC_(s, k) - KMV distinct-count estimate (aggregate, k-bounded buffer)"),
      (cs: Seq[Expression]) => {
        checkArity("graft_kmv_distinct", "(s, k)", cs, 2)
        KmvSketchAgg(cs(0), litInt("graft_kmv_distinct", "(s, k)", cs, 1))
          .toAggregateExpression()
      }),
    (FunctionIdentifier("graft_bounded_collect_set"),
      info("graft_bounded_collect_set",
        "_FUNC_(x, maxSize) - collect_set that yields NULL past maxSize (bounded buffer)"),
      (cs: Seq[Expression]) => {
        checkArity("graft_bounded_collect_set", "(x, maxSize)", cs, 2)
        BoundedCollectAgg(cs(0),
          litInt("graft_bounded_collect_set", "(x, maxSize)", cs, 1),
          distinct = true).toAggregateExpression()
      }),
    (FunctionIdentifier("graft_bounded_collect_list"),
      info("graft_bounded_collect_list",
        "_FUNC_(x, maxSize) - collect_list that yields NULL past maxSize (bounded buffer)"),
      (cs: Seq[Expression]) => {
        checkArity("graft_bounded_collect_list", "(x, maxSize)", cs, 2)
        BoundedCollectAgg(cs(0),
          litInt("graft_bounded_collect_list", "(x, maxSize)", cs, 1),
          distinct = false).toAggregateExpression()
      }),
    (FunctionIdentifier("graft_chunk_tokens"),
      info("graft_chunk_tokens",
        "_FUNC_(toks, size, overlap) - overlapping token-window chunks (RAG split)"),
      (cs: Seq[Expression]) => {
        checkArity("graft_chunk_tokens", "(toks, size, overlap)", cs, 3)
        expression(TextFunctions.chunkTokens(column(cs(0)),
          litInt("graft_chunk_tokens", "(toks, size, overlap)", cs, 1),
          litInt("graft_chunk_tokens", "(toks, size, overlap)", cs, 2)))
      }),
    (FunctionIdentifier("graft_topk_freq"),
      info("graft_topk_freq",
        "_FUNC_(x, capacity, topN) - Space-Saving heavy hitters: top-N (term, cnt) structs, capacity-bounded buffer"),
      (cs: Seq[Expression]) => {
        checkArity("graft_topk_freq", "(x, capacity, topN)", cs, 3)
        TopKFreqAgg(cs(0),
          litInt("graft_topk_freq", "(x, capacity, topN)", cs, 1),
          litInt("graft_topk_freq", "(x, capacity, topN)", cs, 2))
          .toAggregateExpression()
      }),
    (FunctionIdentifier("graft_topk_by_score"),
      info("graft_topk_by_score",
        "_FUNC_(score, id, k) - k best (score, id) structs per group, (score DESC, id ASC); k-bounded buffer"),
      (cs: Seq[Expression]) => {
        checkArity("graft_topk_by_score", "(score, id, k)", cs, 3)
        TopKByScoreAgg(cs(0), cs(1),
          litInt("graft_topk_by_score", "(score, id, k)", cs, 2))
          .toAggregateExpression()
      }),
    (FunctionIdentifier("graft_quantile_sketch"),
      info("graft_quantile_sketch",
        "_FUNC_(x, capacity, p) - mergeable quantile sketch estimate of the p-quantile; exact percentile() semantics while under capacity"),
      (cs: Seq[Expression]) => {
        checkArity("graft_quantile_sketch", "(x, capacity, p)", cs, 3)
        val p = cs(2) match {
          case e if e.foldable && e.resolved => e.eval() match {
            case x: Number => x.doubleValue()
            // SQL decimal literals (0.5) eval to Spark's Decimal
            case d: org.apache.spark.sql.types.Decimal => d.toDouble
            case other => throw new org.apache.spark.sql.AnalysisException(
              errorClass = "_LEGACY_ERROR_TEMP_3088",
              messageParameters = Map("msg" ->
                s"graft_quantile_sketch: p must be a numeric literal, got $other"))
          }
          case _ => throw new org.apache.spark.sql.AnalysisException(
            errorClass = "_LEGACY_ERROR_TEMP_3088",
            messageParameters = Map("msg" ->
              "graft_quantile_sketch: p must be a numeric literal"))
        }
        expression(org.apache.spark.sql.functions.element_at(
          column(QuantileSketchAgg(cs(0),
            litInt("graft_quantile_sketch", "(x, capacity, p)", cs, 1),
            Seq(p)).toAggregateExpression()),
          1))
      }))

  /** Register into a live session (tests, notebooks): the SQL functions
    * plus the [[InferTermBucketFilter]] optimizer rule (idempotent). */
  def register(spark: SparkSession): Unit = {
    all.foreach { case (id, fi, b) =>
      spark.sessionState.functionRegistry.registerFunction(id, fi, b)
    }
    Seq(InferTermBucketFilter, MvRewrite).foreach { r =>
      if (!spark.experimental.extraOptimizations.contains(r))
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations :+ r
    }
  }
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => InferTermBucketFilter)
    ext.injectOptimizerRule(_ => MvRewrite)
  }
}
