package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions, VectorFunctions}

/** Deduplication operators for large-scale training-data pipelines.
  * The reference dedups only by exact content hash (`hashed_page_content`,
  * `/root/reference/backend/process/parsing.py:112`; distinct over a
  * projected column, `backend/process/postgres.py:343-363`); the rest are
  * the standard near-dup family built Spark-first.
  *
  * Scale notes (100 TB design point):
  *  - Exact: one hash-shuffle groupBy; map-side partial agg applies.
  *  - MinHash: signatures are computed per-row with array expressions —
  *    ZERO shuffle for the signature pass; only candidate pairs (post-LSH
  *    banding) shuffle, and the band join key distributes uniformly.
  *  - SimHash: per-row 60-bit signature, again shuffle-free; near-dup
  *    banding on 15-bit quarters.
  *  - n-gram Jaccard runs on LSH candidates only — never all pairs.
  *  - Embedding near-dup joins within LSH buckets (equality join on
  *    bucket), never the full cross product.
  *
  * All hashes are md5-derived so the DuckDB oracle can reproduce them
  * exactly (md5 exists on both engines; `conv(hex,16,10)` ↔
  * `('0x'||hex)::UBIGINT`).
  */
object Dedup {

  val ShingleSize  = 3
  val NumHashes    = 8  // minhash functions
  val BandSize     = 2  // → 4 bands
  val SimHashBits  = 60 // md5-derived 60-bit token hashes

  // ---- exact -------------------------------------------------------------

  /** Exact dedup groups: content hash → representative (min id) + count. */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Exact-dedup the table: keep the min-id row per content hash. */
  def exactDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.join(
      exactGroups(docs, idCol, textCol)
        .select(col("keep_id").as(idCol)),
      Seq(idCol), "left_semi")

  // ---- minhash + LSH banding --------------------------------------------

  /** Per-doc minhash signature columns h0..h{NumHashes-1}: for seed i,
    * min over 3-token shingles of md5("i:" + shingle). Lexicographic min
    * over fixed-width hex = minwise hash in 128-bit space. Computed with
    * array expressions — no explode, no shuffle. */
  def minhashSignatures(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val sh = TextFunctions.shingles(TextFunctions.tokens(col(textCol)),
      ShingleSize)
    val hashes = (0 until NumHashes).map(i =>
      array_min(transform(sh, s => md5(concat(lit(s"$i:"), s)))).as(s"h$i"))
    docs.select((col(idCol).as("doc_id") +: hashes): _*)
  }

  /** LSH band keys: md5 over each band's concatenated minhashes. */
  def minhashBands(sigs: DataFrame): DataFrame = {
    val nBands = NumHashes / BandSize
    val bands = (0 until nBands).map { b =>
      val cols = (0 until BandSize).map(j => col(s"h${b * BandSize + j}"))
      // concat (not concat_ws): null minhash (doc too short for any
      // shingle) must null the band so it never joins, not collapse to
      // md5 of the separator.
      val joined = cols.flatMap(c => Seq(c, lit("|"))).dropRight(1)
      md5(concat(joined: _*)).as(s"b$b")
    }
    sigs.select((col("doc_id") +: bands): _*)
  }

  /** Candidate near-dup pairs: docs sharing at least one LSH band.
    * Returns distinct (a, b) with a < b. The band join is an equality
    * join → hash-partitioned, scales linearly in candidate count. */
  def minhashCandidatePairs(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val nBands = NumHashes / BandSize
    val bands  = minhashBands(minhashSignatures(docs, idCol, textCol))
    val exploded = bands.select(col("doc_id"),
      explode(array((0 until nBands).map(i => col(s"b$i")): _*)).as("band"))
    val l = exploded.select(col("doc_id").as("a"), col("band"))
    val r = exploded.select(col("doc_id").as("b"), col("band"))
    l.join(r, Seq("band")).filter(col("a") < col("b"))
      .select("a", "b").distinct()
  }

  // ---- n-gram jaccard (verified similarity on candidates) ---------------

  /** Jaccard similarity over distinct 3-token shingles for candidate
    * pairs (shared-shingle equality join; at scale feed it
    * [[minhashCandidatePairs]] instead of all pairs). Returns (a, b,
    * jaccard) for pairs with at least one shared shingle. */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      minJaccard: Double): DataFrame = {
    val sh = docs.select(col(idCol).as("doc_id"),
      explode(array_distinct(TextFunctions.shingles(
        TextFunctions.tokens(col(textCol)), ShingleSize))).as("shingle"))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val l = sh.select(col("doc_id").as("a"), col("shingle"))
    val r = sh.select(col("doc_id").as("b"), col("shingle"))
    val common = l.join(r, Seq("shingle")).filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).cast("double").as("n_common"))
    common
      .join(broadcast(sizes.select(col("doc_id").as("a"),
        col("n_sh").as("na"))), Seq("a"))
      .join(broadcast(sizes.select(col("doc_id").as("b"),
        col("n_sh").as("nb"))), Seq("b"))
      .withColumn("jaccard", round(col("n_common") /
        (col("na") + col("nb") - col("n_common")), 6))
      .filter(col("jaccard") >= minJaccard)
      .select("a", "b", "jaccard")
  }

  // ---- simhash -----------------------------------------------------------

  /** 60-bit SimHash per doc, computed entirely with array expressions
    * (token hashes once, then 60 per-bit majority sums) — shuffle-free. */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val hashed = docs.select(col(idCol).as("doc_id"),
      transform(TextFunctions.tokens(col(textCol)),
        t => TextFunctions.md5Long(t)).as("hs"))
    val bitCols = (0 until SimHashBits).map { i =>
      val vote = aggregate(col("hs"), lit(0L),
        (acc, h) => acc + shiftright(h, i).bitwiseAND(lit(1L)) * 2L - 1L)
      when(vote > 0L, lit(1L << i)).otherwise(lit(0L))
    }
    hashed.select(col("doc_id"), bitCols.reduce(_ + _).as("simhash"))
  }

  /** SimHash near-dup candidates: equal 15-bit quarter (Hamming ≤ 3 over
    * 60 bits guarantees one equal quarter — pigeonhole). */
  def simhashCandidatePairs(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val sigs = simhash(docs, idCol, textCol)
    val quarters = sigs.select(col("doc_id"), explode(array(
      (0 until 4).map(q => struct(lit(q).as("q"),
        shiftright(col("simhash"), q * 15).bitwiseAND(lit((1L << 15) - 1))
          .as("v"))): _*)).as("quarter"))
    val l = quarters.select(col("doc_id").as("a"), col("quarter"))
    val r = quarters.select(col("doc_id").as("b"), col("quarter"))
    l.join(r, Seq("quarter")).filter(col("a") < col("b"))
      .select("a", "b").distinct()
  }

  // ---- embedding near-dup ------------------------------------------------

  /** Embedding-cosine near-dup pairs, restricted to LSH buckets (bucket
    * equality join — the scale path; a full cross join never happens).
    * Returns (a, b, cos) with cos ≥ minCosine, a < b. */
  def embeddingNearDupPairs(embs: DataFrame, idCol: String, vecCol: String,
      dim: Int, minCosine: Double, nBits: Int = 8): DataFrame = {
    val bucketed = embs.select(col(idCol).as("id"), col(vecCol).as("v"),
      VectorFunctions.lshSignature(col(vecCol), dim, nBits).as("bucket"))
    val l = bucketed.select(col("id").as("a"), col("v").as("va"), col("bucket"))
    val r = bucketed.select(col("id").as("b"), col("v").as("vb"), col("bucket"))
    l.join(r, Seq("bucket")).filter(col("a") < col("b"))
      .withColumn("cos", round(VectorFunctions.cosine(col("va"), col("vb")), 6))
      .filter(col("cos") >= minCosine)
      .select("a", "b", "cos").distinct()
  }
}
