package graft.operators

import graft.operators.Ckpt.CkptOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket association mining: item-pair co-occurrence with
  * support / confidence / lift — the recommendation-pipeline classic
  * (and, in a training-data pipeline, the tag/source co-occurrence
  * audit). Pair generation follows the repo's one pattern for pairs at
  * scale: groupBy(basket) + in-group combinations under a memory-bounded
  * cap — NEVER an item×item or basket×basket self-join. Item marginals
  * are vocabulary-scale and broadcast; the basket total is one row.
  */
object Association {

  /** Frequent itemsets up to size 3 (distributed A-priori, Agrawal &
    * Srikant VLDB'94): `(k, items, n)` for every itemset of 1–3 items
    * co-occurring in ≥ `minSupport` baskets. Scale shape: the level-1
    * pass is a vocabulary-scale groupBy; its survivors PRUNE the
    * basket relation via a broadcast semi-join before any pair/triple
    * is generated (anti-monotonicity: a set containing an infrequent
    * item cannot be frequent — results are EXACTLY unchanged, the
    * candidate space collapses); pairs ride the in-group
    * combinations-under-cap pattern and triples extend each pair with
    * the basket's remaining larger items — never a basket×basket or
    * item×item self-join. `items` is sorted ascending; output ordered
    * (k, items). */
  def frequentItemsets(df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long = 2L, cap: Int = 10000): DataFrame = {
    require(minSupport >= 1)
    // no pre-distinct pass: level 1 counts DISTINCT baskets per item
    // directly (one partial-agg shuffle) and the per-basket arrays
    // dedup inside boundedCollectSet — a (basket, item) distinct would
    // only add a corpus shuffle (the basketEdges argument)
    val bi = df.select(col(basketCol).as("basket"), col(itemCol).as("item"))
    val f1 = bi.groupBy("item").agg(countDistinct("basket").as("n"))
      .filter(col("n") >= minSupport)
      .graftCheckpoint(false) // consumed by k1 output AND the prune
    // prune to frequent items, then one bounded in-group array per basket
    val sets = bi.join(broadcast(f1.select("item")), Seq("item"), "left_semi")
      .groupBy("basket")
      .agg(sort_array(org.apache.spark.sql.graftext.BoundedCollectAgg
        .boundedCollectSet(col("item"), cap)).as("items"))
      .filter(col("items").isNotNull && size(col("items")) >= 2)
    val pairsRaw = sets
      .select(col("items"),
        explode(org.apache.spark.sql.graftext.PairsAscExpr
          .pairsAsc(col("items"))).as("p"))
    val pairs = pairsRaw
      .groupBy(col("p._1").as("a"), col("p._2").as("b"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= minSupport)
    // triple = pair + any of the basket's items beyond the pair's max
    val triples = pairsRaw
      .select(col("p._1").as("a"), col("p._2").as("b"),
        explode(filter(col("items"), x => x > col("p._2"))).as("c"))
      .groupBy("a", "b", "c").agg(count(lit(1)).as("n"))
      .filter(col("n") >= minSupport)
    val k1 = f1.select(lit(1).as("k"),
      array(col("item").cast("string")).as("items"), col("n"))
    val k2 = pairs.select(lit(2).as("k"),
      array(col("a").cast("string"), col("b").cast("string")).as("items"),
      col("n"))
    val k3 = triples.select(lit(3).as("k"),
      array(col("a").cast("string"), col("b").cast("string"),
        col("c").cast("string")).as("items"), col("n"))
    k1.unionAll(k2).unionAll(k3)
      .orderBy(col("k"), concat_ws("|", col("items")))
  }

  /** Unordered item pairs (a < b) co-occurring in at least `minPairs`
    * baskets: `(a, b, n_ab, support, conf_a_b, conf_b_a, lift)`, all
    * ratios rounded to 6. Baskets larger than `cap` items are dropped
    * (hot-basket guard, mirrored in oracles as `HAVING count <= cap`). */
  def itemPairLift(df: DataFrame, basketCol: String, itemCol: String,
      minPairs: Long = 2L, cap: Int = 10000): DataFrame = {
    // (basket, item) feeds THREE consumers (marginals, basket total,
    // pair generation) — materialize the distinct once; re-deriving it
    // per consumer would triple the dominant scan+shuffle at scale.
    // Lazy checkpoint, not persist: no consumer relies on bi's
    // partitioning (each groupBy re-keys anyway), and checkpoint blocks
    // are ContextCleaner-collected once the frame is unreferenced,
    // where a persist() would pin a corpus-sized cache in the
    // CacheManager for the session lifetime.
    val bi = df.select(col(basketCol).as("basket"), col(itemCol).as("item"))
      .distinct().graftCheckpoint(false)
    val counts = bi.groupBy("item").agg(count(lit(1)).as("n_item"))
    val total  = bi.select(countDistinct("basket").as("n_baskets"))
    val pairs = bi.groupBy("basket")
      .agg(sort_array(org.apache.spark.sql.graftext.BoundedCollectAgg
        .boundedCollectSet(col("item"), cap)).as("items"))
      .filter(col("items").isNotNull && size(col("items")) >= 2)
      .select(explode(org.apache.spark.sql.graftext.PairsAscExpr
        .pairsAsc(col("items"))).as("p"))
      .select(col("p._1").as("a"), col("p._2").as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPairs)
    pairs
      // marginals are |items| rows — broadcast; at corpus-scale item
      // cardinality drop the hints and let AQE pick the join
      .join(broadcast(counts.select(col("item").as("a"),
        col("n_item").as("n_a"))), "a")
      .join(broadcast(counts.select(col("item").as("b"),
        col("n_item").as("n_b"))), "b")
      .crossJoin(broadcast(total))
      .select(col("a"), col("b"), col("n_ab"),
        round(col("n_ab") / col("n_baskets"), 6).as("support"),
        round(col("n_ab") / col("n_a"), 6).as("conf_a_b"),
        round(col("n_ab") / col("n_b"), 6).as("conf_b_a"),
        round(col("n_ab") * col("n_baskets") / (col("n_a") * col("n_b")), 6)
          .as("lift"))
  }
}
