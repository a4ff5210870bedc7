package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Rendezvous (highest-random-weight) sharding — Thaler & Ravishankar
  * 1998, the assignment rule behind consistent-placement systems: key
  * `x` lands on the shard with the highest hash(x, shard). Unlike
  * mod-N hashing (where going N → N+1 remaps ~everything), HRW moves
  * EXACTLY the keys whose new shard wins the argmax — an expected
  * 1/(N+1) of the corpus — so growing a training-data layout (shard
  * files, embedding-index partitions, cache nodes) re-shuffles the
  * minimum possible data.
  *
  * Determinism: the weight is the repo's 60-bit md5 hash of
  * `key + ":" + shard` ([[TextFunctions.md5Long]], oracle-mirrorable);
  * the argmax tie-break is (weight, shard) lexicographic (a 2⁻⁶⁰
  * event, but pinned anyway). Map-only per row — the shard list rides
  * as a literal `sequence`, no shuffle, no state. */
object Sharding {

  /** Winning shard in [0, nShards) for each value of `key`. */
  def rendezvousShard(key: Column, nShards: Int): Column = {
    require(nShards >= 1)
    // max over structs = argmax by (weight, shard) — ties pick the
    // larger shard id, mirroring ORDER BY h DESC, s DESC LIMIT 1
    array_max(transform(sequence(lit(0), lit(nShards - 1)), s =>
      struct(TextFunctions.md5Long(
        concat(key.cast("string"), lit(":"), s.cast("string"))).as("h"),
        s.as("s")))).getField("s")
  }

  /** Rebalance audit for growing `from` → `to` shards: per NEW shard,
    * how many keys land there and how many of those MOVED (different
    * shard under `from`). Ordered by shard. The `moved` total over all
    * rows is the corpus movement — expected n·(to−from)/to for HRW vs
    * ~n·(1−1/to) for mod-N. */
  def rendezvousRebalance(df: DataFrame, keyCol: String,
      from: Int, to: Int): DataFrame = {
    require(from >= 1 && to >= 1)
    df.select(col(keyCol).as("key"))
      .select(col("key"),
        rendezvousShard(col("key"), from).as("s_from"),
        rendezvousShard(col("key"), to).as("s_to"))
      .groupBy(col("s_to").as("shard"))
      .agg(count(lit(1)).as("n_keys"),
        sum(when(col("s_from") =!= col("s_to"), 1L).otherwise(0L))
          .as("n_moved"))
      .orderBy("shard")
  }
}
