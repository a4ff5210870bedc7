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

    TextSearch.positionalPostings(docs, idCol, textCol)
      .withColumn("term_bucket", termBucket(col("term")))
      .repartition(col("term_bucket"))
      .write.mode("overwrite").partitionBy("term_bucket")
      .parquet(s"$indexDir/positions")

    val built = postings.sparkSession.read.parquet(s"$indexDir/postings")
    built.groupBy("term_bucket", "term")
      .agg(countDistinct("doc_id").cast("double").as("df"))
      .repartition(col("term_bucket"))
      .write.mode("overwrite").partitionBy("term_bucket")
      .parquet(s"$indexDir/docfreq")
    // sum_dl is kept alongside avgdl so incremental update can merge
    // stats EXACTLY: dl values are integer-valued doubles, so their sum
    // is order-independent and avgdl' = sum'/n' is bit-identical to a
    // full rebuild (n*avgdl would NOT reconstruct the sum exactly)
    built.select("doc_id", "dl").distinct()
      .agg(count(lit(1)).cast("double").as("n_docs"),
        avg("dl").as("avgdl"), sum("dl").as("sum_dl"))
      .write.mode("overwrite").parquet(s"$indexDir/stats")

    embs.select(col(vecIdCol).as("doc_id"), col(vecCol).as("embedding"))
      .withColumn("lsh_bucket",
        VectorFunctions.lshSignature(col("embedding"), dim, LshBits))
      .repartition(col("lsh_bucket"))
      .write.mode("overwrite").partitionBy("lsh_bucket")
      .parquet(s"$indexDir/vectors")
    invalidateAll(postings.sparkSession, indexDir)
  }

  /** Query-side reads go through the session plan cache (file listing +
    * footer reads over ~320 bucket dirs are paid once, not per query);
    * any mutation invalidates the four table plans. */
  private def cachedTable(spark: SparkSession, indexDir: String,
      name: String): DataFrame =
    graft.Tables.loadPath(spark, s"$indexDir/$name")

  private def invalidateAll(spark: SparkSession, indexDir: String): Unit =
    Seq("postings", "positions", "docfreq", "stats", "vectors")
      .foreach(t => graft.Tables.invalidate(spark, s"$indexDir/$t"))

  /** Incremental index maintenance: fold a batch of NEW docs (disjoint
    * doc_ids from what's indexed) into an existing index without a
    * rebuild. Postings and vectors are pure partition-local appends;
    * docfreq and stats are exact merges (disjoint doc sets → df adds,
    * integer-valued dl sums add) — query results after update are
    * bit-identical to a full rebuild over the union (SearchIndexSpec).
    * At 100 TB this is the difference between touching |batch| data and
    * touching the corpus. */
  def update(newDocs: DataFrame, newEmbs: DataFrame, indexDir: String,
      idCol: String = "doc_id", textCol: String = "text",
      vecIdCol: String = "vec_id", vecCol: String = "embedding",
      dim: Int = 64,
      store: graft.table.CommitStore = graft.table.LocalCommitStore): Unit = {
    val spark = newDocs.sparkSession

    val delta = TextSearch.buildPostings(newDocs, idCol, textCol)
      .withColumn("term_bucket", termBucket(col("term")))
      .persist()
    try {
      delta.repartition(col("term_bucket"))
        .write.mode("append").partitionBy("term_bucket")
        .parquet(s"$indexDir/postings")

      // positions append mirrors postings: new docs are disjoint
      TextSearch.positionalPostings(newDocs, idCol, textCol)
        .withColumn("term_bucket", termBucket(col("term")))
        .repartition(col("term_bucket"))
        .write.mode("append").partitionBy("term_bucket")
        .parquet(s"$indexDir/positions")

      // merge docfreq PARTITION-LOCALLY: new docs are disjoint, so
      // counts simply add — but only the term_buckets present in the
      // delta need re-merging. Untouched buckets are neither read
      // (partition-pruned scan) nor rewritten (their files stay
      // byte-identical; spec pins this). Term dictionaries grow with
      // corpus vocabulary, so a full-dictionary rewrite per micro-batch
      // would make update cost O(vocab) instead of O(|batch vocab|).
      val deltaDf = delta.groupBy("term_bucket", "term")
        .agg(countDistinct("doc_id").cast("double").as("df"))
        .persist()
      // bounded by TermBuckets (64) values — driver-side list is metadata
      val touched = deltaDf.select("term_bucket").distinct()
        .collect().map(_.getInt(0)).sorted.toSeq
      val mergedDf = spark.read.parquet(s"$indexDir/docfreq")
        .filter(col("term_bucket").isin(touched: _*))
        .select("term_bucket", "term", "df")
        .unionByName(deltaDf)
        .groupBy("term_bucket", "term").agg(sum("df").as("df"))
      writeSwapBuckets(mergedDf.repartition(col("term_bucket")),
        s"$indexDir/docfreq", "term_bucket", touched, store)
      deltaDf.unpersist()

      // merge stats: n adds; sum_dl adds exactly (integer-valued dl)
      val deltaStats = delta.select("doc_id", "dl").distinct()
        .agg(count(lit(1)).cast("double").as("d_n"), sum("dl").as("d_sum"))
      val mergedStats = spark.read.parquet(s"$indexDir/stats")
        .crossJoin(deltaStats)
        .select((col("n_docs") + col("d_n")).as("n_docs"),
          // 0/0 guard (ANSI): an empty update onto an emptied index
          coalesce(try_divide(col("sum_dl") + col("d_sum"),
            col("n_docs") + col("d_n")), lit(0.0)).as("avgdl"),
          (col("sum_dl") + col("d_sum")).as("sum_dl"))
      writeSwap(mergedStats, s"$indexDir/stats", partitionCol = None, store)
    } finally delta.unpersist()

    newEmbs.select(col(vecIdCol).as("doc_id"), col(vecCol).as("embedding"))
      .withColumn("lsh_bucket",
        VectorFunctions.lshSignature(col("embedding"), dim, LshBits))
      .repartition(col("lsh_bucket"))
      .write.mode("append").partitionBy("lsh_bucket")
      .parquet(s"$indexDir/vectors")
    invalidateAll(spark, indexDir)
  }

  /** Fuzzy query-term expansion (ES `fuzziness: 1`): match each query
    * term against the index DICTIONARY (docfreq — vocabulary-scale, not
    * the postings) within Levenshtein distance `maxEdits`, and return
    * the matched index terms. The scan is the dictionary, bounded by
    * vocabulary size; the result is metadata-scale (a few terms per
    * query term), so callers collect it and feed [[bm25]]. */
  def fuzzyExpandTerms(spark: SparkSession, indexDir: String,
      query: String, maxEdits: Int = 1): Seq[String] = {
    import spark.implicits._
    val qTerms = query.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      .distinct.toSeq
    if (qTerms.isEmpty) return Nil
    val qdf = qTerms.toDF("qterm")
    cachedTable(spark, indexDir, "docfreq")
      .select("term").distinct()
      .join(broadcast(qdf),
        levenshtein(col("term"), col("qterm")) <= maxEdits)
      .select("term").distinct()
      .collect().map(_.getString(0)).sorted.toSeq
  }

  /** Fuzzy BM25: expand, then score the expanded terms through the
    * standard partition-pruned [[bm25]] path. */
  def bm25Fuzzy(spark: SparkSession, indexDir: String, query: String,
      maxEdits: Int = 1): DataFrame = {
    val terms = fuzzyExpandTerms(spark, indexDir, query, maxEdits)
    bm25(spark, indexDir, terms.mkString(" "))
  }

  /** Wildcard query-term expansion (ES `wildcard` query: `*` = any run
    * of characters, `?` = exactly one): match the pattern against the
    * index DICTIONARY (docfreq — vocabulary-scale, never the postings),
    * capped at `maxExpansions` in term order (the ES rewrite cap that
    * keeps a pathological `*` from exploding the downstream query).
    * Metadata-scale result, so callers collect it. */
  def wildcardExpandTerms(spark: SparkSession, indexDir: String,
      pattern: String, maxExpansions: Int = 50): Seq[String] = {
    val like = pattern.replace("\\", "\\\\").replace("%", "\\%")
      .replace("_", "\\_").replace('*', '%').replace('?', '_')
    cachedTable(spark, indexDir, "docfreq")
      .select("term").distinct()
      .filter(col("term").like(like))
      .orderBy("term").limit(maxExpansions)
      .collect().map(_.getString(0)).toSeq
  }

  /** ES `wildcard` query scored like a bool-should over the expansions:
    * expand against the dictionary, then the standard partition-pruned
    * [[bm25]] path — reference semantics (`elasticsearch_index.py`
    * match/term requests generalized to pattern matching), index-probe
    * cost. */
  def bm25Wildcard(spark: SparkSession, indexDir: String, pattern: String,
      maxExpansions: Int = 50): DataFrame = {
    val terms = wildcardExpandTerms(spark, indexDir, pattern, maxExpansions)
    if (terms.isEmpty)
      spark.range(0).select(col("id").as("doc_id"),
        col("id").cast("double").as("text_score"))
    else bm25(spark, indexDir, terms.mkString(" "))
  }

  /** ES `match_phrase_prefix` over the persisted positional postings:
    * the phrase's leading terms must match exactly and the LAST term is
    * a prefix — expanded against the dictionary (vocabulary-scale scan,
    * `maxExpansions` cap in term order, as ES caps it), then one
    * partition-pruned positions probe over fixed+expanded terms and the
    * same start-alignment algebra as [[phrase]], with every expansion
    * sharing the last slot index (a start matches if ANY expansion sits
    * at it). Returns (doc_id, n_occurrences = distinct matching starts). */
  def phrasePrefix(spark: SparkSession, indexDir: String,
      phraseText: String, maxExpansions: Int = 50): DataFrame = {
    import spark.implicits._
    val terms = TextSearch.phraseTerms(phraseText)
    require(terms.nonEmpty, "phrasePrefix needs at least one term")
    val fixed = terms.init.toSeq
    val exp = cachedTable(spark, indexDir, "docfreq")
      .select("term").distinct()
      .filter(col("term").startsWith(terms.last))
      .orderBy("term").limit(maxExpansions)
      .collect().map(_.getString(0)).toSeq
    if (exp.isEmpty)
      return spark.range(0).select(col("id").as("doc_id"),
        col("id").as("n_occurrences"))
    // (term, slot) pairs: fixed terms take their phrase position, every
    // expansion takes the last slot — countDistinct(idx) over a start
    // then needs all |fixed|+1 slots filled, any expansion satisfying
    // the last one (exactly ES's per-position term set).
    val pairs = fixed.zipWithIndex ++ exp.map(t => (t, fixed.length))
    val allTerms = pairs.map(_._1).distinct
    val buckets = allTerms.map(termBucketOf).distinct
    val pp = cachedTable(spark, indexDir, "positions")
      .filter(col("term_bucket").isin(buckets: _*) &&
        col("term").isin(allTerms: _*))
      .select("doc_id", "pos", "term")
    val ph = pairs.toDF("term", "idx")
    pp.join(broadcast(ph), "term")
      .groupBy(col("doc_id"), (col("pos") - col("idx")).as("start"))
      .agg(countDistinct("idx").as("m"))
      .filter(col("m") === (fixed.length + 1))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_occurrences"))
  }

  /** ES `significant_terms`: terms over-represented in a foreground doc
    * set — here the docs matching `fgTerm`, found by a partition-pruned
    * postings probe — relative to the corpus background. The
    * foreground's term vectors are re-read from `docs` through a
    * broadcast join on doc_id (cost O(|foreground|), never a corpus
    * re-scan); background docfreq and corpus size come straight from
    * the index dictionary and stats (vocabulary-/metadata-scale). JLH
    * score, as in ES: (fgPct - bgPct) * fgPct / bgPct, keeping only
    * terms with positive lift. */
  def significantTerms(spark: SparkSession, indexDir: String,
      docs: DataFrame, fgTerm: String, topN: Int = 10): DataFrame = {
    val fgIds = cachedTable(spark, indexDir, "postings")
      .filter(col("term_bucket") === termBucketOf(fgTerm) &&
        col("term") === fgTerm)
      .select("doc_id")
    // fgToks feeds BOTH the per-term counts and the foreground size —
    // materialize once (it is |foreground|-scale) so the corpus scan
    // behind it runs once, not per consumer. Lazy checkpoint, not
    // persist: the blocks are ContextCleaner-collected with the query
    // (a persist here leaked one cache per significantTerms call into
    // the session CacheManager)
    val fgToks = graft.operators.Ckpt(docs.join(broadcast(fgIds), "doc_id")
      .select(col("doc_id"),
        explode(TextFunctions.tokens(col("text"))).as("term"))
      .distinct(), eager = false)
    val fgAgg = fgToks.groupBy("term").agg(count(lit(1)).as("fg_df"))
    val fgN = fgToks.agg(countDistinct("doc_id").as("fg_n"))
    cachedTable(spark, indexDir, "docfreq").select("term", "df")
      .join(broadcast(fgAgg), "term")
      .crossJoin(broadcast(fgN))
      .crossJoin(broadcast(
        cachedTable(spark, indexDir, "stats").select("n_docs")))
      .filter(col("term") =!= fgTerm)
      .withColumn("fg_pct", col("fg_df") / col("fg_n"))
      .withColumn("bg_pct", col("df") / col("n_docs"))
      .filter(col("fg_pct") > col("bg_pct"))
      .select(col("term"), col("fg_df"), col("df").cast("long").as("bg_df"),
        round((col("fg_pct") - col("bg_pct")) * col("fg_pct") / col("bg_pct"),
          6).as("sig"))
      .orderBy(col("sig").desc, col("term").asc)
      .limit(topN)
  }

  /** The `more_like_this` term-mining step: the seed document's top
    * `maxTerms` terms by tf·idf. Driver-side over ONE document plus a
    * bucket-pruned dictionary lookup — query planning, not a data pass.
    * The idf is the same BM25 idf the scorer uses (and the same
    * expression shape as the oracle SQL), so "interesting" means
    * exactly what the ranking rewards. */
  def mltTerms(spark: SparkSession, indexDir: String, docs: DataFrame,
      seedDocId: Long, maxTerms: Int = 5): Seq[String] = {
    val seedTf = docs.filter(col("doc_id") === seedDocId)
      .select(explode(TextFunctions.tokens(col("text"))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("tf"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    require(seedTf.nonEmpty, s"seed doc $seedDocId missing or empty")
    val buckets = seedTf.keys.map(termBucketOf).toSeq.distinct
    val dfMap = cachedTable(spark, indexDir, "docfreq")
      .filter(col("term_bucket").isin(buckets: _*) &&
        col("term").isin(seedTf.keys.toSeq: _*))
      .select("term", "df")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val n = cachedTable(spark, indexDir, "stats")
      .select("n_docs").head().getDouble(0)
    seedTf.toSeq.map { case (t, tf) =>
        val df = dfMap.getOrElse(t, 0.0)
        t -> tf.toDouble * math.log(1.0 + (n - df + 0.5) / (df + 0.5))
      }.sortBy { case (t, s) => (-s, t) }.take(maxTerms).map(_._1)
  }

  /** ES `more_like_this`: [[mltTerms]] feeds the standard
    * partition-pruned [[bm25]] path, excluding the seed itself. */
  def moreLikeThis(spark: SparkSession, indexDir: String, docs: DataFrame,
      seedDocId: Long, maxTerms: Int = 5): DataFrame =
    bm25(spark, indexDir,
        mltTerms(spark, indexDir, docs, seedDocId, maxTerms).mkString(" "))
      .filter(col("doc_id") =!= seedDocId)

  /** ES `search_after` keyset pagination: the page strictly after the
    * cursor (afterScore, afterDocId) in the (score DESC, doc_id ASC)
    * total order. Unlike OFFSET pagination, the cost of page N does not
    * grow with N: every page is the same pruned index probe plus one
    * TakeOrdered of `pageSize` — no global sort, no materialization of
    * the skipped prefix. Scores are rounded to 6 decimals BEFORE the
    * cursor comparison so a cursor read off one page's output is exact
    * against the next page's filter. */
  def searchAfter(spark: SparkSession, indexDir: String, query: String,
      afterScore: Double, afterDocId: Long, pageSize: Int = 10): DataFrame =
    bm25(spark, indexDir, query)
      .select(col("doc_id"), round(col("text_score"), 6).as("bm25"))
      .filter(col("bm25") < afterScore ||
        (col("bm25") === afterScore && col("doc_id") > afterDocId))
      .orderBy(col("bm25").desc, col("doc_id").asc)
      .limit(pageSize)

  /** ES completion suggester over the index dictionary: terms with the
    * given prefix, ranked by document frequency. Scans only docfreq —
    * vocabulary-scale, orders of magnitude smaller than the corpus —
    * and returns metadata-scale rows. (term_bucket is hash-derived so a
    * prefix cannot partition-prune; the dictionary being tiny relative
    * to postings is what makes this cheap — the same trade ES makes
    * with its in-heap terms index.) */
  def suggest(spark: SparkSession, indexDir: String, prefix: String,
      n: Int = 10): DataFrame =
    cachedTable(spark, indexDir, "docfreq")
      .filter(col("term").startsWith(prefix))
      .select(col("term"), col("df").cast("long").as("df"))
      .orderBy(col("df").desc, col("term").asc)
      .limit(n)

  /** ES `bool` query over the persisted index: `must` terms all required
    * (and scored), `should` terms optional-but-scored with
    * `minimumShouldMatch`, `filterTerms` required but unscored (ES
    * filter context), `mustNot` terms excluded. ONE partition-pruned
    * postings probe over the union of all clause terms; match flags and
    * the BM25 sum come out of a single per-doc aggregate, so must_not is
    * a flag test — never a separate anti-join pass. */
  def boolSearch(spark: SparkSession, indexDir: String,
      must: Seq[String], should: Seq[String] = Nil,
      mustNot: Seq[String] = Nil, filterTerms: Seq[String] = Nil,
      minimumShouldMatch: Int = 0, size: Int = 10,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val mustD    = must.map(_.toLowerCase).distinct
    val shouldD  = should.map(_.toLowerCase).distinct
    val notD     = mustNot.map(_.toLowerCase).distinct
    val filterD  = filterTerms.map(_.toLowerCase).distinct
    val scoring  = (mustD ++ shouldD).distinct
    val allTerms = (scoring ++ notD ++ filterD).distinct
    require(allTerms.nonEmpty, "bool query needs at least one term")
    val buckets = allTerms.map(termBucketOf).distinct

    val postings = cachedTable(spark, indexDir, "postings")
      .filter(col("term_bucket").isin(buckets: _*) &&
        col("term").isin(allTerms: _*))
    // dictionary rows only for the SCORING terms: filter/must_not
    // clauses never contribute idf (ES filter context)
    val dfreq = cachedTable(spark, indexDir, "docfreq")
      .filter(col("term_bucket").isin(buckets: _*) &&
        col("term").isin(scoring: _*))
    val stats = cachedTable(spark, indexDir, "stats")

    def matched(ts: Seq[String]) =
      if (ts.isEmpty) lit(0L)
      else countDistinct(when(col("term").isin(ts: _*), col("term")))

    postings
      .join(broadcast(dfreq.select("term", "df")), Seq("term"), "left")
      .crossJoin(broadcast(stats))
      .withColumn("term_score", when(col("df").isNotNull,
        log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)) *
          col("tf") * (k1 + 1.0) /
          (col("tf") + lit(k1) *
            (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
        .otherwise(lit(0.0)))
      .groupBy("doc_id")
      .agg(sum("term_score").as("raw"),
        matched(mustD).as("n_must"), matched(shouldD).as("n_should"),
        matched(filterD).as("n_filter"), matched(notD).as("n_not"))
      .filter(col("n_must") === mustD.size &&
        col("n_filter") === filterD.size &&
        col("n_should") >= minimumShouldMatch && col("n_not") === 0)
      .select(col("doc_id"), round(col("raw"), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(size)
  }

  /** ES `rare_terms` aggregation: the long-tail complement of `terms`
    * (which surfaces the most frequent) — terms whose document
    * frequency is at most `maxDf`, rarest first. Served entirely from
    * the index DICTIONARY like [[suggest]]: vocabulary-scale scan,
    * never touches postings or the corpus. */
  def rareTerms(spark: SparkSession, indexDir: String,
      maxDf: Long, size: Int = 10): DataFrame =
    cachedTable(spark, indexDir, "docfreq")
      .filter(col("df") <= maxDf)
      .select(col("term"), col("df").cast("long").as("df"))
      .orderBy(col("df").asc, col("term").asc)
      .limit(size)

  /** ES `dis_max` + `boosting` composed over the persisted index: each
    * clause scores as its BM25 term-sum, the doc's base score is
    * `max(clause) + tieBreaker · (Σclause − max(clause))`, and matching
    * any `negative` term multiplies by `negativeBoost` (the boosting
    * query's demote-don't-exclude semantics — contrast must_not in
    * [[boolSearch]]). ONE partition-pruned postings probe over the
    * union of all clause + negative terms; per-clause sums and the
    * negative flag come out of a single per-doc aggregate. */
  def disMax(spark: SparkSession, indexDir: String,
      clauses: Seq[Seq[String]], tieBreaker: Double,
      negative: Seq[String] = Nil, negativeBoost: Double = 1.0,
      size: Int = 10, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(clauses.nonEmpty, "dis_max needs at least one clause")
    val cls = clauses.map(_.map(_.toLowerCase).distinct)
    val negD = negative.map(_.toLowerCase).distinct
    val scoring = cls.flatten.distinct
    val allTerms = (scoring ++ negD).distinct
    val buckets = allTerms.map(termBucketOf).distinct

    val postings = cachedTable(spark, indexDir, "postings")
      .filter(col("term_bucket").isin(buckets: _*) &&
        col("term").isin(allTerms: _*))
    // negative terms are demotion signals, not scoring terms — no idf
    val dfreq = cachedTable(spark, indexDir, "docfreq")
      .filter(col("term_bucket").isin(buckets: _*) &&
        col("term").isin(scoring: _*))
    val stats = cachedTable(spark, indexDir, "stats")

    val scored = postings
      .join(broadcast(dfreq.select("term", "df")), Seq("term"), "left")
      .crossJoin(broadcast(stats))
      .withColumn("term_score", when(col("df").isNotNull,
        log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)) *
          col("tf") * (k1 + 1.0) /
          (col("tf") + lit(k1) *
            (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
        .otherwise(lit(0.0)))

    val clauseSums = cls.zipWithIndex.map { case (ts, i) =>
      coalesce(sum(when(col("term").isin(ts: _*), col("term_score"))),
        lit(0.0)).as(s"__c$i")
    }
    val negFlag = (if (negD.isEmpty) lit(0L)
      else coalesce(max(when(col("term").isin(negD: _*), 1L)), lit(0L)))
      .as("__neg")

    val agg = scored.groupBy("doc_id")
      .agg(clauseSums.head, (clauseSums.tail :+ negFlag): _*)
    val cSums = cls.indices.map(i => col(s"__c$i"))
    val best = if (cSums.size == 1) cSums.head else greatest(cSums: _*)
    val total = cSums.reduce(_ + _)
    agg
      .filter(cls.indices.map(i => col(s"__c$i") > 0.0).reduce(_ || _))
      .select(col("doc_id"),
        round((best + lit(tieBreaker) * (total - best)) *
          when(col("__neg") === 1L, lit(negativeBoost)).otherwise(lit(1.0)),
          6).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(size)
  }

  /** Proximity (ES `match` with slop) over the persisted positional
    * postings: the scan is pruned to the query terms' buckets, then the
    * same anchor-window algebra as [[TextSearch.proximityMatch]] —
    * identical semantics, index-probe cost (the positional twin of
    * [[phrase]] vs `TextSearch.phraseMatch`). */
  def proximity(spark: SparkSession, indexDir: String, query: String,
      slop: Int): DataFrame = {
    val terms = query.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).distinct
    require(terms.nonEmpty, "proximity needs at least one term")
    val buckets = terms.map(termBucketOf).distinct.toSeq
    TextSearch.proximityAlign(
      cachedTable(spark, indexDir, "positions")
        .filter(col("term_bucket").isin(buckets: _*) &&
          col("term").isin(terms.toSeq: _*))
        .select("doc_id", "pos", "term"),
      terms, slop)
  }

  /** ES `_stats`/`_count` parity: corpus statistics read FROM THE INDEX
    * (stats row + dictionary aggregate) — never a corpus scan. One
    * metadata-scale row: doc count, avg doc length, vocabulary size,
    * total postings (distinct (term, doc) pairs) and the max document
    * frequency. */
  def indexStats(spark: SparkSession, indexDir: String): DataFrame =
    cachedTable(spark, indexDir, "stats")
      .select(col("n_docs").cast("long").as("n_docs"),
        round(col("avgdl"), 6).as("avgdl"))
      .crossJoin(broadcast(
        cachedTable(spark, indexDir, "docfreq")
          .agg(count(lit(1)).as("n_terms"),
            sum(col("df")).cast("long").as("n_postings"),
            max(col("df")).cast("long").as("max_df"))))

  /** Shard merge: fold the index at `srcDir` into the index at `dstDir`
    * (disjoint doc sets — the shard-per-partition build pattern, e.g.
    * one index per ingest slice merged into the serving index). Both
    * sides bucket with the same [[termBucket]]/LSH expressions, so
    * postings/positions/vectors fold as partition-local appends and
    * docfreq/stats as the exact merges [[update]] uses — query results
    * after merge are bit-identical to one build over the union
    * (SearchIndexSpec). Touches src-sized data plus the touched
    * docfreq buckets, never dst's postings. */
  def merge(spark: SparkSession, srcDir: String, dstDir: String,
      store: graft.table.CommitStore = graft.table.LocalCommitStore): Unit = {
    spark.read.parquet(s"$srcDir/postings")
      .repartition(col("term_bucket"))
      .write.mode("append").partitionBy("term_bucket")
      .parquet(s"$dstDir/postings")
    spark.read.parquet(s"$srcDir/positions")
      .repartition(col("term_bucket"))
      .write.mode("append").partitionBy("term_bucket")
      .parquet(s"$dstDir/positions")

    val srcDf = spark.read.parquet(s"$srcDir/docfreq")
      .select("term_bucket", "term", "df")
    // bounded by TermBuckets (64) — driver-side list is metadata
    val touched = srcDf.select("term_bucket").distinct()
      .collect().map(_.getInt(0)).sorted.toSeq
    val mergedDf = spark.read.parquet(s"$dstDir/docfreq")
      .filter(col("term_bucket").isin(touched: _*))
      .select("term_bucket", "term", "df")
      .unionByName(srcDf)
      .groupBy("term_bucket", "term").agg(sum("df").as("df"))
    writeSwapBuckets(mergedDf.repartition(col("term_bucket")),
      s"$dstDir/docfreq", "term_bucket", touched, store)

    val srcStats = spark.read.parquet(s"$srcDir/stats")
      .select(col("n_docs").as("d_n"), col("sum_dl").as("d_sum"))
    val mergedStats = spark.read.parquet(s"$dstDir/stats")
      .crossJoin(srcStats) // 1-row × 1-row
      .select((col("n_docs") + col("d_n")).as("n_docs"),
        ((col("sum_dl") + col("d_sum")) / (col("n_docs") + col("d_n")))
          .as("avgdl"),
        (col("sum_dl") + col("d_sum")).as("sum_dl"))
    writeSwap(mergedStats, s"$dstDir/stats", partitionCol = None, store)

    spark.read.parquet(s"$srcDir/vectors")
      .repartition(col("lsh_bucket"))
      .write.mode("append").partitionBy("lsh_bucket")
      .parquet(s"$dstDir/vectors")
    invalidateAll(spark, dstDir)
  }

  /** Write `df` to a staging dir then swap it in through the
    * [[graft.table.CommitStore]] commit primitive (Spark cannot
    * overwrite a parquet dir that feeds the running plan). The local
    * store's swap is rename-based; an object-store deployment swaps the
    * store implementation (manifest commit), not this code. */
  private def writeSwap(df: DataFrame, dir: String,
      partitionCol: Option[String],
      store: graft.table.CommitStore = graft.table.LocalCommitStore): Unit = {
    import java.nio.file.Paths
    val tmp = dir + "__tmp"
    val w = df.write.mode("overwrite")
    partitionCol.fold(w)(c => w.partitionBy(c)).parquet(tmp)
    store.swapDir(Paths.get(tmp), Paths.get(dir))
  }

  /** Partition-local swap: write the merged buckets to a staging dir,
    * then swap ONLY the touched `bucketCol=v` subdirectories into the
    * live table — every other bucket directory is untouched (same
    * files, same bytes). Each subdirectory swap goes through the same
    * [[graft.table.CommitStore]] primitive as [[writeSwap]]. A bucket
    * the rewrite emptied (no staged dir) is deleted from the live
    * table — that's what a rebuild without its rows would produce.
    *
    * Invariant kept for readers: the dir is ALWAYS a readable parquet
    * table. A rewrite that empties EVERY bucket would otherwise leave a
    * footer-less dir (schema inference fails on the next read), so the
    * emptied table is published as a FLAT 0-row parquet file carrying
    * the full schema — `bucketCol` as a regular column. The inverse
    * transition (first rows arriving into an emptied table) clears that
    * marker before bucket dirs go live, or partition discovery would
    * see a mixed flat/partitioned layout. */
  private def writeSwapBuckets(df: DataFrame, dir: String,
      bucketCol: String, buckets: Seq[Any],
      store: graft.table.CommitStore = graft.table.LocalCommitStore): Unit = {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val dirP = Paths.get(dir)
    def bucketDirs(): Seq[java.nio.file.Path] =
      if (!Files.isDirectory(dirP)) Nil
      else Files.list(dirP).iterator.asScala
        .filter(_.getFileName.toString.startsWith(s"$bucketCol="))
        .toSeq
    def markerFiles(): Seq[java.nio.file.Path] =
      if (!Files.isDirectory(dirP)) Nil
      else Files.list(dirP).iterator.asScala.filter { p =>
        val n = p.getFileName.toString
        Files.isRegularFile(p) &&
          (n.startsWith("part-") || n == "_SUCCESS" || n.endsWith(".crc"))
      }.toSeq
    val tmp = dir + "__tmp"
    df.write.mode("overwrite").partitionBy(bucketCol).parquet(tmp)
    val anyStaged = buckets.exists(b =>
      Files.exists(Paths.get(tmp, s"$bucketCol=$b")))
    if (anyStaged && bucketDirs().isEmpty)
      markerFiles().foreach(store.deleteRecursive) // revive from marker
    buckets.foreach { b =>
      val staged = Paths.get(tmp, s"$bucketCol=$b")
      val live   = Paths.get(dir, s"$bucketCol=$b")
      if (Files.exists(staged)) store.swapDir(staged, live)
      else store.deleteRecursive(live)
    }
    store.deleteRecursive(Paths.get(tmp))
    if (bucketDirs().isEmpty) // every bucket emptied: publish the marker
      writeSwap(df.limit(0), dir, partitionCol = None, store)
  }

  /** Doc-level retraction (PII / takedown): remove `ids` from postings,
    * positions and vectors, decrement docfreq (terms whose df reaches 0
    * disappear, as a rebuild would have it), and subtract the victims
    * from stats — so every query AFTER delete behaves exactly as if the
    * index had been built without those docs (SearchIndexSpec pins
    * delete ≡ rebuild). The reference can only drop a whole index
    * (`elasticsearch_index.py:325-350`); an LLM-pipeline index needs the
    * per-doc form.
    *
    * Scale shape: ONE pruned-column scan over postings/vectors finds the
    * victims' rows and their touched buckets (a doc's terms hash across
    * the bucket space, so no tighter bound exists without a doc→terms
    * sidecar); rewrites then touch ONLY those buckets, partition-locally,
    * through the same staged-swap commit as [[update]]. Untouched bucket
    * dirs keep their exact bytes. */
  def delete(spark: SparkSession, indexDir: String, ids: Seq[Long],
      store: graft.table.CommitStore = graft.table.LocalCommitStore): Unit = {
    if (ids.isEmpty) return
    val isVictim = col("doc_id").isInCollection(ids)

    val postings = spark.read.parquet(s"$indexDir/postings")
    val victims = postings.filter(isVictim).persist()
    // Every victim-derived aggregate is MATERIALIZED ON THE DRIVER before
    // the first swap. A persist() is not durable: cache eviction or
    // executor loss recomputes the lineage, and after the postings swap
    // that lineage re-reads the already-rewritten files — zero victim
    // rows, so docfreq/stats would silently diverge from the postings
    // (corrupted BM25 idf/avgdl, no error). All three collects are
    // metadata-scale: touched buckets ≤ TermBuckets; df decrements ≤
    // |victim docs| × their distinct terms (a takedown batch, not the
    // corpus); the stats delta is one row.
    val (touched, decRows, dN, dSum) = try {
      val touched = victims.select("term_bucket").distinct()
        .collect().map(_.getInt(0)).sorted.toSeq
      val decRows = victims.groupBy("term_bucket", "term")
        .agg(countDistinct("doc_id").cast("double").as("ddf"))
        .collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2)))
        .toSeq
      // integer-valued dl sums subtract exactly, mirroring update's merge
      val s = victims.select("doc_id", "dl").distinct()
        .agg(count(lit(1)).cast("double").as("d_n"), sum("dl").as("d_sum"))
        .collect()(0)
      (touched, decRows, s.getDouble(0), if (s.isNullAt(1)) 0.0 else s.getDouble(1))
    } finally victims.unpersist()

    if (touched.nonEmpty) {
      val positions = spark.read.parquet(s"$indexDir/positions")
      val touchedPos = positions
        .filter(isVictim).select("term_bucket").distinct()
        .collect().map(_.getInt(0)).sorted.toSeq

      writeSwapBuckets(
        postings.filter(col("term_bucket").isin(touched: _*) && !isVictim)
          .repartition(col("term_bucket")),
        s"$indexDir/postings", "term_bucket", touched, store)

      if (touchedPos.nonEmpty) writeSwapBuckets(
        positions.filter(col("term_bucket").isin(touchedPos: _*) && !isVictim)
          .repartition(col("term_bucket")),
        s"$indexDir/positions", "term_bucket", touchedPos, store)

      // docfreq: per-term decrement by the victims' distinct-doc count
      // (from the pre-swap driver copy); df exhausted ⇒ the term leaves
      // the dictionary
      import spark.implicits._
      val dec = decRows.toDF("term_bucket", "term", "ddf")
      val mergedDf = spark.read.parquet(s"$indexDir/docfreq")
        .filter(col("term_bucket").isin(touched: _*))
        .join(broadcast(dec), Seq("term_bucket", "term"), "left")
        .select(col("term_bucket"), col("term"),
          (col("df") - coalesce(col("ddf"), lit(0.0))).as("df"))
        .filter(col("df") > 0)
      writeSwapBuckets(mergedDf.repartition(col("term_bucket")),
        s"$indexDir/docfreq", "term_bucket", touched, store)

      // stats: subtract the pre-swap scalar delta
      // retracting the LAST doc empties the index: n_docs hits 0 and
      // avgdl is 0/0 — define it as 0.0 (bm25 never reads avgdl from an
      // empty index, but the stats row must still write)
      val mergedStats = spark.read.parquet(s"$indexDir/stats")
        .select((col("n_docs") - lit(dN)).as("n_docs"),
          coalesce(try_divide(col("sum_dl") - lit(dSum),
            col("n_docs") - lit(dN)), lit(0.0)).as("avgdl"),
          (col("sum_dl") - lit(dSum)).as("sum_dl"))
      writeSwap(mergedStats, s"$indexDir/stats", partitionCol = None,
        store)
    }

    val vectors = spark.read.parquet(s"$indexDir/vectors")
    // partition-column type inference may narrow lsh_bucket to int —
    // cast so the collected probe list is stable
    val touchedV = vectors.filter(isVictim)
      .select(col("lsh_bucket").cast("long")).distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    if (touchedV.nonEmpty) writeSwapBuckets(
      vectors.filter(col("lsh_bucket").isin(touchedV: _*) && !isVictim)
        .repartition(col("lsh_bucket")),
      s"$indexDir/vectors", "lsh_bucket", touchedV, store)
    invalidateAll(spark, indexDir)
  }

  /** Bulk doc-level retraction driven by a RELATION of ids — the
    * scale-safe twin of [[delete]]. The Seq form literal-lists the ids
    * into the plan and collects per-term decrements to the driver: the
    * right call for a PII micro-batch (its stated contract), unusable
    * for a 10⁶-id backfill retraction. Here ids stay a DataFrame end to
    * end: victims are found by semi-join, survivors by anti-join, and
    * the per-term df decrements are MATERIALIZED TO A STAGING DIR
    * before the first bucket swap (the durability the Seq form buys
    * with driver copies — a cached lineage would re-read the already-
    * rewritten buckets) and merged back as a relation join. The only
    * driver-side lists are the touched-bucket ids, bounded by the
    * bucket-space knobs, never by |ids|. The ids relation itself is
    * caller data, not index lineage, so it stays valid across swaps.
    * Result ≡ [[delete]] ≡ rebuild without the victims
    * (SearchIndexSpec pins all three). */
  def bulkDelete(spark: SparkSession, indexDir: String, ids: DataFrame,
      store: graft.table.CommitStore = graft.table.LocalCommitStore): Unit = {
    val idRel = ids.select(col(ids.columns.head).cast("long").as("doc_id"))
    val stage = s"$indexDir/__delete_stage"

    val postings = spark.read.parquet(s"$indexDir/postings")
    postings.join(idRel, Seq("doc_id"), "left_semi")
      .select("term_bucket", "term", "doc_id", "dl")
      .write.mode("overwrite").parquet(s"$stage/victim_postings")
    val vp = spark.read.parquet(s"$stage/victim_postings")
    // touched buckets: ≤ TermBuckets rows — a knob, not data-scale
    val touched = vp.select("term_bucket").distinct()
      .collect().map(_.getInt(0)).sorted.toSeq

    if (touched.nonEmpty) {
      val positions = spark.read.parquet(s"$indexDir/positions")
      val touchedPos = positions.join(idRel, Seq("doc_id"), "left_semi")
        .select("term_bucket").distinct()
        .collect().map(_.getInt(0)).sorted.toSeq
      // per-term df decrements: relation-sized, staged — never driver-side
      vp.groupBy("term_bucket", "term")
        .agg(countDistinct("doc_id").cast("double").as("ddf"))
        .write.mode("overwrite").parquet(s"$stage/dec")
      // one-row stats delta (driver scalar, scale-independent)
      val s0 = vp.select("doc_id", "dl").distinct()
        .agg(count(lit(1)).cast("double").as("d_n"), sum("dl").as("d_sum"))
        .collect()(0)
      val dN = s0.getDouble(0)
      val dSum = if (s0.isNullAt(1)) 0.0 else s0.getDouble(1)

      writeSwapBuckets(
        postings.filter(col("term_bucket").isin(touched: _*))
          .join(idRel, Seq("doc_id"), "left_anti")
          .repartition(col("term_bucket")),
        s"$indexDir/postings", "term_bucket", touched, store)

      if (touchedPos.nonEmpty) writeSwapBuckets(
        positions.filter(col("term_bucket").isin(touchedPos: _*))
          .join(idRel, Seq("doc_id"), "left_anti")
          .repartition(col("term_bucket")),
        s"$indexDir/positions", "term_bucket", touchedPos, store)

      val dec = spark.read.parquet(s"$stage/dec")
      val mergedDf = spark.read.parquet(s"$indexDir/docfreq")
        .filter(col("term_bucket").isin(touched: _*))
        .join(dec, Seq("term_bucket", "term"), "left")
        .select(col("term_bucket"), col("term"),
          (col("df") - coalesce(col("ddf"), lit(0.0))).as("df"))
        .filter(col("df") > 0)
      writeSwapBuckets(mergedDf.repartition(col("term_bucket")),
        s"$indexDir/docfreq", "term_bucket", touched, store)

      // retracting the LAST doc empties the index: n_docs hits 0 and
      // avgdl is 0/0 — define it as 0.0 (bm25 never reads avgdl from an
      // empty index, but the stats row must still write)
      val mergedStats = spark.read.parquet(s"$indexDir/stats")
        .select((col("n_docs") - lit(dN)).as("n_docs"),
          coalesce(try_divide(col("sum_dl") - lit(dSum),
            col("n_docs") - lit(dN)), lit(0.0)).as("avgdl"),
          (col("sum_dl") - lit(dSum)).as("sum_dl"))
      writeSwap(mergedStats, s"$indexDir/stats", partitionCol = None,
        store)
    }

    val vectors = spark.read.parquet(s"$indexDir/vectors")
    val touchedV = vectors.join(idRel, Seq("doc_id"), "left_semi")
      .select(col("lsh_bucket").cast("long")).distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    if (touchedV.nonEmpty) writeSwapBuckets(
      vectors.filter(col("lsh_bucket").isin(touchedV: _*))
        .join(idRel, Seq("doc_id"), "left_anti")
        .repartition(col("lsh_bucket")),
      s"$indexDir/vectors", "lsh_bucket", touchedV, store)
    store.deleteRecursive(java.nio.file.Paths.get(stage))
    invalidateAll(spark, indexDir)
  }

  /** Maintenance — merge the small files that incremental [[update]]s
    * accrete inside each bucket dir back to one file per bucket (the
    * per-bucket form of [[graft.table.ParquetCatalog.compact]]): after
    * thousands of micro-batches a probe pays |files| opens per bucket,
    * not 1. Only FRAGMENTED buckets (>1 parquet file) are rewritten,
    * through the same staged swap as [[update]] — results are
    * bit-identical rows, untouched buckets keep their exact bytes.
    * Returns (filesBefore, filesAfter) summed over rewritten buckets. */
  def compact(spark: SparkSession, indexDir: String,
      store: graft.table.CommitStore = graft.table.LocalCommitStore)
      : (Long, Long) = {
    import java.nio.file.{Files, Paths}
    var before = 0L
    var after = 0L
    Seq("postings" -> "term_bucket", "positions" -> "term_bucket",
      "docfreq" -> "term_bucket", "vectors" -> "lsh_bucket")
      .foreach { case (table, bucketCol) =>
        val root = Paths.get(s"$indexDir/$table")
        if (Files.isDirectory(root)) {
          def filesIn(p: java.nio.file.Path): Int = {
            val s = Files.list(p)
            try {
              var n = 0
              val it = s.iterator()
              while (it.hasNext)
                if (it.next().toString.endsWith(".parquet")) n += 1
              n
            } finally s.close()
          }
          val ls = Files.list(root)
          val fragmented = try {
            val b = Seq.newBuilder[String]
            val it = ls.iterator()
            while (it.hasNext) {
              val p = it.next()
              val name = p.getFileName.toString
              if (name.startsWith(s"$bucketCol=") && filesIn(p) > 1) {
                b += name.stripPrefix(s"$bucketCol=")
                before += filesIn(p)
              }
            }
            b.result()
          } finally ls.close()
          if (fragmented.nonEmpty) {
            val vals: Seq[Any] =
              if (bucketCol == "lsh_bucket") fragmented.map(_.toLong)
              else fragmented.map(_.toInt)
            val df = spark.read.parquet(s"$indexDir/$table")
              .filter(col(bucketCol).isin(vals: _*))
              .repartition(col(bucketCol))
            writeSwapBuckets(df, s"$indexDir/$table", bucketCol, vals,
              store)
            vals.foreach(v =>
              after += filesIn(root.resolve(s"$bucketCol=$v")))
          }
        }
      }
    invalidateAll(spark, indexDir)
    (before, after)
  }

  /** BM25 over the prebuilt index: reads only the query terms' buckets
    * (partition pruning on `term_bucket`), never re-tokenizes the corpus.
    * No driver-side count()/head() at query time — stats are a 1-row
    * broadcast relation. */
  def bm25(spark: SparkSession, indexDir: String, query: String,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val qTerms = query.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).distinct
    val buckets = qTerms.map(termBucketOf).distinct.toSeq

    val postings = cachedTable(spark, indexDir, "postings")
      .filter(col("term_bucket").isin(buckets: _*) &&
        col("term").isin(qTerms.toSeq: _*))
    val dfreq = cachedTable(spark, indexDir, "docfreq")
      .filter(col("term_bucket").isin(buckets: _*) &&
        col("term").isin(qTerms.toSeq: _*))
    val stats = cachedTable(spark, indexDir, "stats")

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
  /** Phrase query over the persisted positional postings (ES
    * `match_phrase` on the index): the scan is pruned to the phrase's
    * term buckets (partition pruning) and terms, then the same
    * start-alignment algebra as [[TextSearch.phraseMatch]] — identical
    * semantics, index-probe cost. */
  def phrase(spark: SparkSession, indexDir: String,
      phraseText: String): DataFrame = {
    val terms = TextSearch.phraseTerms(phraseText)
    val buckets = terms.map(termBucketOf).distinct.toSeq
    TextSearch.phraseAlign(
      cachedTable(spark, indexDir, "positions")
        .filter(col("term_bucket").isin(buckets: _*) &&
          col("term").isin(terms.distinct.toSeq: _*))
        .select("doc_id", "pos", "term"),
      terms)
  }

  def knn(spark: SparkSession, indexDir: String, queryVec: Array[Float],
      k: Int, dim: Int = 64, probeHammingRadius: Int = 1): DataFrame = {
    val qSig = graft.search.VectorSearch.querySignature(queryVec, dim, LshBits)
    val probes = (0L until (1L << LshBits))
      .filter(bkt => java.lang.Long.bitCount(bkt ^ qSig) <= probeHammingRadius)
    val cands = cachedTable(spark, indexDir, "vectors")
      .filter(col("lsh_bucket").isin(probes: _*))
    cands.select(col("doc_id"),
      round(VectorFunctions.cosine(col("embedding"), typedLit(queryVec)), 6)
        .as("vec_score"))
      .orderBy(col("vec_score").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Batch BM25: score N queries in ONE pass over the index. The
    * reference serves one query per HTTP request
    * (`backend/routers/es_index.py:90-131`); at pipeline scale you
    * broadcast the whole (query_id, term) relation into a single
    * partition-pruned postings probe, score every (query_id, doc_id)
    * pair in one shuffle, and take top-k per query with the
    * k-bounded [[org.apache.spark.sql.graftext.TopKByScoreAgg]] —
    * NOT a `row_number over (partition by query_id)` window, which
    * would sort each query's entire candidate set in one task.
    * Result ≡ running [[bm25]] once per query, top-k'd
    * (SearchIndexSpec pins the equivalence).
    *
    * Returns (query_id, doc_id, text_score, rank), rank 1-based per
    * query by (score DESC, doc_id ASC).
    */
  def bm25Batch(spark: SparkSession, indexDir: String,
      queries: Seq[(Long, String)], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25BatchScores(spark, indexDir, queries, k1, b)
      // round BEFORE ranking: ordering on the rounded score (doc_id
      // tiebreak) is reproducible across engines; raw-double ordering
      // is not (summation-order FP noise can flip near-ties)
      .withColumn("text_score", round(col("text_score"), 6))
      .groupBy("query_id")
      .agg(org.apache.spark.sql.graftext.TopKByScoreAgg.topKByScore(
        col("text_score"), col("doc_id"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("rk", "t")))
      .select(col("query_id"), col("t.id").as("doc_id"),
        col("t.score").as("text_score"),
        (col("rk") + 1).cast("long").as("rank"))

  /** The scoring core of [[bm25Batch]]: every (query_id, doc_id) pair's
    * RAW BM25 sum, un-rounded and un-ranked — [[hybridBatch]] fuses
    * these with vector scores exactly the way single-query [[hybrid]]
    * consumes [[bm25]] (raw text side, rounding at fuse time). */
  private def bm25BatchScores(spark: SparkSession, indexDir: String,
      queries: Seq[(Long, String)],
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import spark.implicits._
    val qTerms = queries.flatMap { case (qid, text) =>
      text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).distinct
        .map(t => (qid, t))
    }
    val allTerms = qTerms.map(_._2).distinct
    val buckets = allTerms.map(termBucketOf).distinct

    val postings = cachedTable(spark, indexDir, "postings")
      .filter(col("term_bucket").isin(buckets: _*) &&
        col("term").isin(allTerms: _*))
    val dfreq = cachedTable(spark, indexDir, "docfreq")
      .filter(col("term_bucket").isin(buckets: _*) &&
        col("term").isin(allTerms: _*))
    val stats = cachedTable(spark, indexDir, "stats")

    postings
      // fan out each posting to every query containing its term
      .join(broadcast(qTerms.toDF("query_id", "term")), "term")
      .join(broadcast(dfreq.select("term", "df")), "term")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("term_score",
        col("idf") * col("tf") * (k1 + 1.0) /
          (col("tf") + lit(k1) *
            (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy("query_id", "doc_id")
      .agg(sum("term_score").as("text_score"))
  }

  /** Batch ANN: N query vectors in ONE pass over the vector index. Each
    * query probes its own Hamming ball; the union of probed buckets is
    * partition-pruned once, the (query_id → bucket) probe relation and
    * the (query_id → qvec) relation are broadcast, and top-k per query
    * comes from the k-bounded aggregate (same rationale as
    * [[bm25Batch]]). Result ≡ running [[knn]] once per query. */
  def knnBatch(spark: SparkSession, indexDir: String,
      queries: Seq[(Long, Array[Float])], k: Int, dim: Int = 64,
      probeHammingRadius: Int = 1): DataFrame = {
    import spark.implicits._
    val probeRows = queries.flatMap { case (qid, v) =>
      val sig = graft.search.VectorSearch.querySignature(v, dim, LshBits)
      (0L until (1L << LshBits))
        .filter(bkt => java.lang.Long.bitCount(bkt ^ sig) <= probeHammingRadius)
        .map(bkt => (qid, bkt))
    }
    val buckets = probeRows.map(_._2).distinct

    cachedTable(spark, indexDir, "vectors")
      .filter(col("lsh_bucket").isin(buckets: _*))
      .join(broadcast(probeRows.toDF("query_id", "lsh_bucket")), "lsh_bucket")
      .join(broadcast(queries.map { case (qid, v) => (qid, v.toSeq) }
        .toDF("query_id", "qvec")), "query_id")
      .select(col("query_id"), col("doc_id"),
        round(VectorFunctions.cosine(col("embedding"), col("qvec")), 6)
          .as("vec_score"))
      .groupBy("query_id")
      .agg(org.apache.spark.sql.graftext.TopKByScoreAgg.topKByScore(
        col("vec_score"), col("doc_id"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("rk", "t")))
      .select(col("query_id"), col("t.id").as("doc_id"),
        col("t.score").as("vec_score"),
        (col("rk") + 1).cast("long").as("rank"))
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

  /** Batch hybrid: N queries fused in ONE pass over both index legs —
    * the batch composition of [[bm25Batch]]'s text scores (raw, like
    * single-query [[hybrid]] consumes [[bm25]]) with [[knnBatch]]'s
    * per-query top-candidates, full-outer on (query_id, doc_id), the
    * same boost/min_score/top-k semantics per query. Per-query top-k is
    * the k-bounded aggregate, never a window over the fused set.
    * Result ≡ running [[hybrid]] once per query (SearchIndexSpec). */
  def hybridBatch(spark: SparkSession, indexDir: String,
      queries: Seq[(Long, String)], embedder: Embedder, size: Int = 10,
      minScore: Double = 0.5, textBoost: Double = 1.0,
      vectorBoost: Double = 0.8, probeHammingRadius: Int = 2): DataFrame = {
    val nCand = math.max(size * 10, 50)
    val text = bm25BatchScores(spark, indexDir, queries)
    val vec = knnBatch(spark, indexDir,
      queries.map { case (qid, t) => qid -> embedder.embed(t) },
      nCand, embedder.dim, probeHammingRadius)
      .select(col("query_id"), col("doc_id"), col("vec_score"))
    text.join(vec, Seq("query_id", "doc_id"), "full_outer")
      .select(col("query_id"), col("doc_id"),
        round(coalesce(col("text_score"), lit(0.0)) * textBoost +
          coalesce(col("vec_score"), lit(0.0)) * vectorBoost, 6).as("score"))
      .filter(col("score") >= minScore)
      .groupBy("query_id")
      .agg(org.apache.spark.sql.graftext.TopKByScoreAgg.topKByScore(
        col("score"), col("doc_id"), size).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("rk", "t")))
      .select(col("query_id"), col("t.id").as("doc_id"),
        col("t.score").as("score"),
        (col("rk") + 1).cast("long").as("rank"))
  }
}
