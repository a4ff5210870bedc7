package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Sharding]] — rendezvous (HRW) placement: determinism, coverage,
  * and the property that makes it worth having over mod-N — minimal
  * movement under shard growth. */
class ShardingSpec extends SparkSpec {
  import spark.implicits._

  private def keys(n: Int) = (1L to n.toLong).toDF("k")

  test("assignment is deterministic, in range, and covers all shards " +
      "roughly uniformly") {
    val df = keys(2000).select(col("k"),
      Sharding.rendezvousShard(col("k"), 8).as("s"))
    val counts = df.groupBy("s").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts.keySet == (0 until 8).toSet, s"coverage: $counts")
    // md5 is uniform: no shard grossly over/under (expected 250 each)
    assert(counts.values.forall(c => c > 150 && c < 350), s"$counts")
    // deterministic across evaluations
    val again = keys(2000).select(col("k"),
      Sharding.rendezvousShard(col("k"), 8).as("s"))
    assert(df.collect().toSeq == again.collect().toSeq)
  }

  test("growing 8 -> 9 moves ~1/9 of keys, every move lands on the NEW " +
      "shard, and unmoved keys keep their shard (HRW's whole point)") {
    val n = 3000
    val df = keys(n).select(col("k"),
      Sharding.rendezvousShard(col("k"), 8).as("s8"),
      Sharding.rendezvousShard(col("k"), 9).as("s9"))
    val moved = df.filter(col("s8") =!= col("s9")).collect()
    // every moved key moved TO shard 8 (the new one): HRW only
    // reassigns keys whose new shard wins the argmax
    assert(moved.forall(_.getInt(2) == 8),
      s"non-minimal move: ${moved.take(3).mkString(",")}")
    val frac = moved.length.toDouble / n
    assert(frac > 0.05 && frac < 0.18, s"moved fraction $frac (exp ~1/9)")
    // rebalance audit sums match
    val audit = Sharding.rendezvousRebalance(keys(n), "k", 8, 9)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(audit.map(_._2).sum == n)
    assert(audit.map(_._3).sum == moved.length)
    assert(audit.filter(_._1 == 8).forall(t => t._2 == t._3),
      "every key on the new shard is a moved key")
  }
}
