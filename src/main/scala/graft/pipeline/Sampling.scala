package graft.pipeline

import graft.operators.Ckpt.CkptOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Deterministic sampling / selection operators for training-data
  * curation. All decisions derive from md5 of the row's id — stable
  * across runs, engines and partitionings (a `rand()` sample is neither
  * reproducible nor oracle-checkable), and shuffle-free where possible.
  */
object Sampling {

  private val M = 1000000L

  /** Keep ≈`rate` of rows, decided per-row by id hash — no shuffle, no
    * RNG state, refreshable incrementally (new rows get the same rule). */
  def hashSample(df: DataFrame, idCol: String, rate: Double): DataFrame =
    df.filter(pmod(TextFunctions.md5Long(col(idCol).cast("string")), lit(M))
      < lit((rate * M).toLong))

  /** Leakage-safe train/eval split: the split UNIT is a GROUP (a
    * near-dup cluster, a source domain, a content hash) — every member
    * of a group lands on the same side, so no near-duplicate of an eval
    * document can leak into training (splitting by doc id, as
    * [[hashSample]] does, gives ~rate·(1−rate) of every dup-pair a foot
    * on each side). Deterministic md5 of the group key in ppm space;
    * adds a `split` column, shuffles nothing (the group key is already
    * on the row). */
  def groupSplit(df: DataFrame, groupKey: Column,
      trainRate: Double): DataFrame =
    df.withColumn("split",
      when(pmod(TextFunctions.md5Long(groupKey.cast("string")), lit(M))
        < lit((trainRate * M).toLong), "train").otherwise("eval"))

  /** At most `n` rows per stratum, chosen by id-hash order (deterministic
    * "random" representative set). Bucketed prefix-sum shape — see
    * [[mixtureTake]]; this is the uniform-quota special case. */
  def stratifiedTake(df: DataFrame, stratumCol: String, idCol: String,
      n: Int): DataFrame =
    bucketedRankTake(df, stratumCol, idCol, lit(n))

  /** Weighted sampling WITHOUT replacement, Efraimidis–Spirakis A-ES:
    * each row gets key `u^(1/w)` (u = md5-uniform in (0,1], w = its
    * weight) and the global top-k by key is the sample — inclusion
    * probability rises with weight, and the whole draw is one TakeOrdered
    * (per-partition top-k, single reduce; no global sort, no RNG state,
    * replayable). THE distributed weighted sampler: works as a bounded
    * heap on a stream, and k survivors per partition is all that crosses
    * the wire. Keys are rounded to 9 dp (id tiebreak) so the selection
    * boundary is engine-exact — the one place a raw libm `pow` ulp could
    * otherwise flip a rank. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      k: Int): DataFrame = {
    val u = (TextFunctions.md5Long(col(idCol).cast("string")) + 1)
      .cast("double") / graft.functions.Sketches.HashSpace
    df.withColumn("sample_key",
        round(pow(u, lit(1.0) / col(weightCol).cast("double")), 9))
      .orderBy(col("sample_key").desc, col(idCol).asc)
      .limit(k)
  }

  /** Mixture sampling — the data-MIXING step: per-stratum target counts
    * (e.g. rebalance languages to a prescribed recipe) instead of one
    * uniform cap. Rows are chosen in id-hash order like
    * [[stratifiedTake]]; strata absent from `targets` are dropped. Same
    * one-shuffle window shape; the recipe rides along as a map literal,
    * so no second input or join. */
  def mixtureTake(df: DataFrame, stratumCol: String, idCol: String,
      targets: Map[String, Int]): DataFrame = {
    require(targets.nonEmpty, "mixture recipe must not be empty")
    val quota = coalesce(
      element_at(typedLit(targets), col(stratumCol).cast("string")), lit(0))
    bucketedRankTake(df, stratumCol, idCol, quota)
  }

  /** Hash-order buckets for the admission operators below. The bucket of
    * a row is the TOP bits of its 60-bit id hash, so bucket order IS
    * admission order: every row of bucket b precedes every row of
    * bucket b+1 in the global (hash, id) ordering of its stratum, and a
    * hash tie can never straddle a bucket boundary (equal hash ⇒ equal
    * bucket). 64 buckets × |strata| totals is metadata-sized. */
  private val AdmitBucketBits = 6
  private def admitBucket(h: Column): Column =
    shiftright(h, 60 - AdmitBucketBits)

  /** Scale-safe per-stratum rank admission (row quota). A
    * `Window.partitionBy(stratum)` row_number serializes each stratum
    * onto one task — with ~30 languages over 100 TB, one task absorbs a
    * language's entire corpus. Instead: bucket rows by hash order,
    * aggregate per-(stratum, bucket) counts (a metadata-sized grid),
    * window the EXCLUSIVE prefix counts over that grid only, broadcast
    * them back, and rank locally within each (stratum, bucket). Buckets
    * whose prefix already meets the quota are pruned BEFORE the sort,
    * so the admission sort touches ≈ the admitted rows, not the corpus.
    * Output rows and order semantics are identical to the single-window
    * form (same global (hash, id) admission order per stratum). */
  private def bucketedRankTake(df: DataFrame, stratumCol: String,
      idCol: String, quota: Column): DataFrame = {
    val withKey = df
      .withColumn("__h", TextFunctions.md5Long(col(idCol).cast("string")))
      .withColumn("__b", admitBucket(col("__h")))
    val wGrid = Window.partitionBy(stratumCol).orderBy(col("__b").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefixes = withKey.groupBy(stratumCol, "__b")
      .agg(count(lit(1)).as("__bn"))
      .withColumn("__pre", coalesce(sum("__bn").over(wGrid), lit(0L)))
      .select(col(stratumCol), col("__b"), col("__pre"))
    val wLocal = Window.partitionBy(stratumCol, "__b")
      .orderBy(col("__h").asc, col(idCol).asc)
    withKey
      .join(broadcast(prefixes), Seq(stratumCol, "__b"))
      .filter(col("__pre") < quota) // bucket fully beyond quota → pruned
      .withColumn("__rn", col("__pre") + row_number().over(wLocal))
      .filter(col("__rn") <= quota)
      .select(df.columns.map(col).toIndexedSeq: _*)
  }

  /** Greedy per-stratum token budget: admit rows in id-hash order while
    * the stratum's running token total stays within `budget`. The
    * standard "N tokens per language" curation step. Same bucketed
    * prefix-sum shape as [[bucketedRankTake]] (the running total is a
    * sum of token counts instead of a row count): per-(stratum, bucket)
    * token totals → exclusive prefix over the metadata grid → broadcast
    * back → local running sum offset by the bucket prefix. Token counts
    * must be non-negative (prefix pruning assumes a monotone total). */
  def tokenBudget(df: DataFrame, stratumCol: String, idCol: String,
      tokensCol: String, budget: Long): DataFrame = {
    val withKey = df
      .withColumn("__h", TextFunctions.md5Long(col(idCol).cast("string")))
      .withColumn("__b", admitBucket(col("__h")))
    val wGrid = Window.partitionBy(stratumCol).orderBy(col("__b").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefixes = withKey.groupBy(stratumCol, "__b")
      .agg(sum(col(tokensCol)).as("__btok"))
      .withColumn("__pre", coalesce(sum("__btok").over(wGrid), lit(0L)))
      .select(col(stratumCol), col("__b"), col("__pre"))
    val wLocal = Window.partitionBy(stratumCol, "__b")
      .orderBy(col("__h").asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withKey
      .join(broadcast(prefixes), Seq(stratumCol, "__b"))
      .filter(col("__pre") <= budget) // exhausted buckets pruned pre-sort
      .withColumn("__cum", col("__pre") + sum(col(tokensCol)).over(wLocal))
      .filter(col("__cum") <= budget)
      .select(df.columns.map(col).toIndexedSeq: _*)
  }

  /** Rank-based quantile buckets (ntile semantics with tie stability):
    * rows with equal `valueCol` always land in the same bucket — the
    * bucket of a value is `1 + (nBuckets * |rows strictly below|) div n`.
    *
    * Scale shape: NO global-sort window over the data (ntile/percent_rank
    * would move every row to one task). The only window runs over the
    * DISTINCT values (metadata-sized: quality scores are 6-dp bounded),
    * and the per-row assignment is a broadcast join back. All-integer
    * arithmetic — no percentile interpolation, so the result is
    * bit-identical on any engine. */
  def quantileBuckets(df: DataFrame, valueCol: String,
      nBuckets: Int): DataFrame = {
    require(nBuckets >= 1, "nBuckets must be >= 1")
    val vc = df.groupBy(valueCol).agg(count(lit(1)).as("__cnt"))
    val w = Window.orderBy(col(valueCol).asc) // distinct values only
    val cum = vc
      .withColumn("__cb", sum("__cnt").over(w) - col("__cnt"))
      .select(col(valueCol), col("__cb"))
    val tot = df.agg(count(lit(1)).as("__n"))
    df.join(broadcast(cum), Seq(valueCol))
      .crossJoin(broadcast(tot))
      .withColumn("bucket",
        (lit(1) + expr(s"($nBuckets * __cb) div __n")).cast("int"))
      .drop("__cb", "__n")
  }

  /** Quality-decile histogram of a corpus — the "inspect before you cut"
    * curation step: score every doc, bucket into deciles, report each
    * decile's population and score range. Filtering to `bucket >= k` is
    * then the quality gate. */
  def qualityDeciles(docs: DataFrame, textCol: String): DataFrame = {
    val scored = docs.withColumn("__q",
      graft.text.TextAnalysis.qualityScore(col(textCol)))
    quantileBuckets(scored, "__q", 10)
      .groupBy(col("bucket").as("decile"))
      .agg(count(lit(1)).as("n_docs"),
        round(min(col("__q")), 6).as("min_q"),
        round(max(col("__q")), 6).as("max_q"))
  }

  /** Deterministic global shuffle + shard assignment — the last step
    * before writing training shards. Every doc gets a shuffle key
    * (md5 of a salted id — engine-reproducible, seed = new epoch
    * ordering), a shard (key mod nShards: statistically balanced with
    * no coordination), and its position within the shard (the write
    * order). The only per-shard sort is the position ranking — exactly
    * the sortWithinPartitions a sharded write performs anyway, corpus/
    * nShards rows per task, never a global sort. */
  def shuffleShards(df: DataFrame, idCol: String, nShards: Int,
      salt: String = "shuf"): DataFrame = {
    require(nShards >= 1, "need nShards >= 1")
    val key = TextFunctions.md5Long(
      concat(lit(salt + ":"), col(idCol).cast("string")))
    df.select(col(idCol), key.as("skey"),
        pmod(key, lit(nShards)).cast("long").as("shard"))
      .withColumn("pos", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("shard").orderBy(col("skey"), col(idCol)))
        .cast("long"))
      .select(col("shard"), col(idCol), col("pos"))
  }

  /** Group-aware k-fold assignment — [[groupSplit]] generalized to
    * cross-validation: every member of a group (near-dup cluster,
    * domain, upload batch) lands in the SAME fold, so no fold's eval
    * slice contains a near-duplicate of another fold's training data.
    * Deterministic md5 of the group key mod k; shuffle-free. */
  def groupFolds(df: DataFrame, groupKey: Column, k: Int): DataFrame = {
    require(k >= 2, s"need k >= 2 folds, got $k")
    df.withColumn("fold",
      pmod(TextFunctions.md5Long(groupKey.cast("string")), lit(k.toLong))
        .cast("int"))
  }

  /** Temporal train/test split with an EMBARGO gap (the leakage guard
    * for time-series features: a rolling feature computed near the
    * boundary sees both sides, so rows inside the gap are quarantined
    * — de Prado's purged split). Boundaries derive from the corpus
    * time span by INTEGER microsecond arithmetic (broadcast 1-row
    * bounds; `div` keeps the cut engine-exact): train < t0,
    * embargo ∈ [t0, t0+gap), test ≥ t0+gap, with t0 at `trainPct`% and
    * the gap `gapPct`% of the span. Adds a `split` column; one
    * broadcast join, no shuffle of the fact table. */
  def embargoSplit(events: DataFrame, tsCol: String, trainPct: Int,
      gapPct: Int): DataFrame = {
    require(trainPct > 0 && gapPct >= 0 && trainPct + gapPct < 100,
      s"bad split percentages: $trainPct/$gapPct")
    val us = expr(s"unix_micros($tsCol)")
    val bounds = events
      .agg(min(us).as("__tmin"), max(us).as("__tmax"))
      .select(
        (col("__tmin") +
          expr(s"((__tmax - __tmin) * $trainPct) div 100")).as("__t0"),
        (col("__tmin") +
          expr(s"((__tmax - __tmin) * ${trainPct + gapPct}) div 100"))
          .as("__t1"))
    events.join(broadcast(bounds))
      .withColumn("split",
        when(us < col("__t0"), "train")
          .when(us < col("__t1"), "embargo")
          .otherwise("test"))
      .drop("__t0", "__t1")
  }

  /** Fractional-epoch mixture materialization (the DoReMi / D4 /
    * data-constrained-scaling shape): each row carries a target epoch
    * count `epochs` (possibly fractional — "see wiki 2.5 times per
    * training run") and is emitted ⌊epochs⌋ times plus once more with
    * probability frac(epochs), decided by md5 of (id, epoch-index) in
    * ppm space. Deterministic: the same doc gets the same copy set on
    * every run and engine (no RNG state), so a resumed or re-sharded
    * materialization is idempotent. Shuffle-free — each row expands
    * locally via `explode(sequence)` (fan-out ≤ ⌈epochs⌉, a small
    * constant), and admission is a per-row hash test; at 100 TB this
    * is a map-only stage feeding [[shuffleShards]]. Epoch index is
    * 1-based; `epochs` must be ≥ 0 (0 drops the row). */
  def epochMixture(df: DataFrame, idCol: String,
      epochsCol: Column): DataFrame = {
    val e = epochsCol.cast("double")
    val full = floor(e).cast("int")
    val frac = e - floor(e)
    df.withColumn("epoch", explode(sequence(lit(1), full + 1)))
      .filter(col("epoch") <= full ||
        pmod(TextFunctions.md5Long(
          concat(col(idCol).cast("string"), lit(":e"),
            col("epoch").cast("string"))), lit(M))
          < (frac * M).cast("long"))
  }

  /** Neyman-optimal stratified-sample allocation: for a labeling /
    * eval budget of `budget` units, allocate n_h ∝ N_h·σ_h — the
    * minimum-variance design for estimating a stratified mean (the
    * "where should the annotators spend their time" planner; q44's
    * stratifiedTake then EXECUTES the draw). One partial-agg scan to
    * per-stratum exact decimal moments; σ_h and the weights are
    * identical doubles (cross-stratum normalizer 6-dp DECIMAL-summed),
    * integer floors plus largest-remainder so the allocations sum to
    * exactly `budget` (remainder ranks on the metadata-sized stratum
    * frame, fraction desc / stratum asc — deterministic). Returns
    * (stratum, n_h, sigma, alloc) ordered by stratum; single-row
    * strata carry σ = 0 and only win remainder seats. */
  def neymanAllocation(df: DataFrame, stratumCol: String,
      valueCol: String, budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    require(budget > 0)
    val d184 = (c: Column) => c.cast(DecimalType(18, 4))
    val d386 = DecimalType(38, 6)
    val m = df
      .select(col(stratumCol).cast("string").as("stratum"),
        d184(col(valueCol)).as("__v"))
      .groupBy("stratum")
      .agg(count(lit(1)).as("n_h"),
        sum(col("__v")).cast("double").as("__s"),
        sum(col("__v") * col("__v")).cast("double").as("__q"))
    val nD = col("n_h").cast("double")
    val sigma = when(col("n_h") > 1L,
      sqrt((col("__q") - col("__s") * col("__s") / nD) / (nD - 1.0)))
      .otherwise(lit(0.0))
    val scored = m.select(col("stratum"), col("n_h"),
        round(sigma, 6).as("sigma"))
      .withColumn("__w", nD * col("sigma"))
      .graftCheckpoint(true)
    val tot = broadcast(scored.agg(
      sum(round(col("__w"), 6).cast(d386)).cast("double").as("__t")))
    val withShare = scored.crossJoin(tot)
      .withColumn("__share",
        when(col("__t") > 0.0, col("__w") / col("__t"))
          .otherwise(lit(0.0)))
      .withColumn("__fl",
        floor(lit(budget.toDouble) * col("__share")).cast("long"))
      .withColumn("__fr", lit(budget.toDouble) * col("__share")
        - col("__fl").cast("double"))
    val left = broadcast(withShare.agg(
      (lit(budget) - sum(col("__fl"))).as("__left")))
    val wRank = Window.orderBy(col("__fr").desc, col("stratum").asc)
    withShare.crossJoin(left)
      .withColumn("__rk", row_number().over(wRank)) // stratum-frame only
      .select(col("stratum"), col("n_h"), col("sigma"),
        (col("__fl") + when(col("__rk") <= col("__left"), 1L)
          .otherwise(0L)).as("alloc"))
      .orderBy("stratum")
  }

  /** Quality-gated corpus: the full curation chain (dedup → quality floor
    * → per-language budget) as one declarative plan. */
  def curate(docs: DataFrame, idCol: String, textCol: String,
      langCol: String, minQuality: Double, tokensPerLang: Long): DataFrame = {
    val deduped = graft.dedup.Dedup.exactDedup(docs, idCol, textCol)
    val scored = deduped
      .withColumn("__q", graft.text.TextAnalysis.qualityScore(col(textCol)))
      .withColumn("__tok", TextFunctions.tokenCount(col(textCol)))
      .filter(col("__q") >= minQuality)
    tokenBudget(scored, langCol, idCol, "__tok", tokensPerLang)
      .drop("__q", "__tok")
  }
}
