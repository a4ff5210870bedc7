package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the harness-provided parquet tables (TESTDATA.md).
  *
  * Every `SparkEntry.queries` entry receives `(spark, sfDir)` and loads
  * its inputs through here, so filters/projections written on top of
  * these frames are pushed into the parquet scan by Catalyst
  * (PushedFilters / ReadSchema — verified via `.explain("formatted")`).
  */
object Tables {

  /** Plan cache: a loaded table is an immutable logical plan, but
    * building it costs a file listing + footer read (and `spread` an
    * RDD-partition probe) — re-paid on EVERY query otherwise. Keyed by
    * `sessionUUID` (unique and stable — identity hashes can be reused
    * after GC and would let a new session see another session's plans).
    * This is the metadata cache any real catalog keeps; no row data is
    * cached. */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
  private[graft] def memo(s: SparkSession, key: String)(f: => DataFrame)
      : DataFrame = {
    // NOT computeIfAbsent: memoized builders call other memoized builders
    // (documents → load), and a nested compute on the same CHM throws
    // "Recursive update" whenever the two keys land in the same bin.
    // get/putIfAbsent tolerates recursion; a lost race merely builds the
    // same immutable plan twice.
    val k = org.apache.spark.sql.graftext.SessionUtils.uuid(s) + "|" + key
    val hit = cache.get(k)
    if (hit != null) hit
    else {
      val built = f
      val prev  = cache.putIfAbsent(k, built)
      if (prev != null) prev else built
    }
  }

  /** Memoized parquet load of an arbitrary path (index tables, catalog
    * tables). `invalidate` after overwriting the path. Heals any
    * interrupted commit-swap at/under the path first (crash between
    * swapDir's two renames — see CommitStore.healSwapsUnder), so a
    * half-swapped table recovers on first read instead of surfacing a
    * missing dir or a `__old` garbage partition. Memoization bounds the
    * heal's directory listing to once per (session, path). */
  private[graft] def loadPath(s: SparkSession, path: String): DataFrame =
    memo(s, path) {
      // both protocols' heals are cheap no-ops on dirs the other owns
      val p = java.nio.file.Paths.get(path)
      graft.table.LocalCommitStore.healSwapsUnder(p)
      graft.table.ManifestCommitStore.healSwapsUnder(p)
      s.read.parquet(path)
    }

  private[graft] def invalidate(s: SparkSession, path: String): Unit = {
    // Drop the path's plans for EVERY session, not just the caller's:
    // foreachBatch (and thriftserver etc.) run in CLONED sessions, so a
    // mutation inside a micro-batch must also evict the outer session's
    // memoized plan — whose FileIndex still lists the deleted files
    // (FAILED_READ_FILE.FILE_NOT_EXIST on next use otherwise).
    val suffix = "|" + path
    cache.keySet.removeIf(_.endsWith(suffix))
    // also drop cached-plan data for the path in this session's shared
    // CacheManager (covers .cache()d frames over the dir)
    s.catalog.refreshByPath(path)
  }

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    memo(spark, s"$dir/$name") {
      spark.read.parquet(s"$dir/$name.parquet")
    }

  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  /** events.parquet has shipped `ts` as TIMESTAMP(NANOS) in some fixture
    * generations (Spark's vectorized reader rejects it; with
    * `nanosAsLong` it surfaces as raw long nanos, rebuilt to a
    * microsecond timestamp with integer arithmetic — a double division
    * at 1e18 ns would lose precision, 53-bit mantissa) and as plain
    * TIMESTAMP(MICROS) in others (reads natively). Branch on the loaded
    * dtype so both generations work. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.expr(
          "timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // rebuilt-nanos generations produced TIMESTAMP_LTZ; align the
        // native-micros read to the same type (session TZ is pinned UTC,
        // so the instant is identical) — downstream `unix_micros` etc.
        // require LTZ
        df.withColumn("ts", org.apache.spark.sql.functions.col("ts")
          .cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }
  /** The text/vector tables ship as one parquet row group, so Spark scans
    * them as ONE partition — and every per-row-heavy operator (minhash,
    * simhash, cosine, fingerprints) would run single-threaded. Spread them
    * across the cluster when the scan has fewer partitions than cores.
    * The shuffle cost is one pass over the raw column data — trivially
    * repaid by parallelizing the downstream hashing; on a real 100 TB
    * table the scan already has thousands of splits and this is a no-op.
    */
  private def spread(df: DataFrame, s: SparkSession): DataFrame = {
    val p = s.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }

  def documents(s: SparkSession, d: String): DataFrame  =
    memo(s, s"$d/documents#spread")(spread(load(s, d, "documents"), s))
  def embeddings(s: SparkSession, d: String): DataFrame =
    memo(s, s"$d/embeddings#spread")(spread(load(s, d, "embeddings"), s))
}
