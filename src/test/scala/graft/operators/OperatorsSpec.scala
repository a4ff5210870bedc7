package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val quotes = Seq(
    (1L, ts("2024-01-01 10:00:00"), 100.0, 11L),
    (1L, ts("2024-01-01 11:00:00"), 110.0, 12L),
    (1L, ts("2024-01-01 11:00:00"), 115.0, 13L), // same time, higher id wins
    (2L, ts("2024-01-01 10:30:00"), 200.0, 21L)
  ).toDF("key", "qts", "price", "qid")

  private val trades = Seq(
    (1L, ts("2024-01-01 10:30:00"), "t1"), // after 10:00 quote
    (1L, ts("2024-01-01 11:00:00"), "t2"), // equal time: inclusive, id 13
    (1L, ts("2024-01-01 09:00:00"), "t3"), // before any quote → null
    (2L, ts("2024-01-01 12:00:00"), "t4"),
    (3L, ts("2024-01-01 12:00:00"), "t5")  // key with no quotes → null
  ).toDF("key", "tts", "trade_id")

  test("asOf: latest carrier at or before probe time, per key") {
    val r = AsOfJoin.asOf(trades, quotes, Seq("key"), "tts", "qts",
      Seq("price", "qid"), tiebreak = "qid")
      .collect().map(x => x.getAs[String]("trade_id") ->
        (Option(x.getAs[Any]("price")), Option(x.getAs[Any]("qid")))).toMap
    assert(r("t1") === (Some(100.0), Some(11L)))
    assert(r("t2") === (Some(115.0), Some(13L))) // inclusive + tiebreak
    assert(r("t3") === (None, None))
    assert(r("t4") === (Some(200.0), Some(21L)))
    assert(r("t5") === (None, None))
    assert(r.size === 5) // left join semantics: every probe kept
  }

  test("asOf forward: earliest carrier at or after; min tiebreak at equal time") {
    val r = AsOfJoin.asOf(trades, quotes, Seq("key"), "tts", "qts",
      Seq("price", "qid"), tiebreak = "qid", direction = "forward")
      .collect().map(x => x.getAs[String]("trade_id") ->
        (Option(x.getAs[Any]("price")), Option(x.getAs[Any]("qid")))).toMap
    assert(r("t1") === (Some(110.0), Some(12L))) // next is 11:00, min id 12
    assert(r("t2") === (Some(110.0), Some(12L))) // inclusive at equal time
    assert(r("t3") === (Some(100.0), Some(11L))) // first quote of the day
    assert(r("t4") === (None, None))             // nothing after 12:00
    assert(r("t5") === (None, None))
  }

  test("asOf tolerance: matches farther than the window become null") {
    // backward, 30 min tolerance: t1 (10:30 vs 10:00) is exactly at the
    // edge and kept; tightening to 29 min drops it
    val keep = AsOfJoin.asOf(trades, quotes, Seq("key"), "tts", "qts",
      Seq("qid"), tiebreak = "qid", toleranceSec = Some(1800L))
      .collect().map(x => x.getAs[String]("trade_id") ->
        Option(x.getAs[Any]("qid"))).toMap
    assert(keep("t1") === Some(11L))
    assert(keep("t4") === None) // 12:00 vs 10:30 = 90 min > 30 min
    val tight = AsOfJoin.asOf(trades, quotes, Seq("key"), "tts", "qts",
      Seq("qid"), tiebreak = "qid", toleranceSec = Some(1740L))
      .collect().map(x => x.getAs[String]("trade_id") ->
        Option(x.getAs[Any]("qid"))).toMap
    assert(tight("t1") === None)
    assert(tight("t2") === Some(13L)) // equal time: gap 0
  }

  test("saltedJoin: identical result set to the plain join") {
    val big = (1 to 500).map(i =>
      (if (i % 10 == 0) "hot" else s"k$i", i.toLong)).toDF("key", "v")
    val dim = Seq(("hot", "H"), ("k3", "A"), ("k7", "B")).toDF("key", "label")
    val plain = big.join(dim, Seq("key"))
      .select("key", "v", "label").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    val salted = SkewJoin.saltedJoin(big, dim, Seq("key"),
      saltFactor = 8, saltSource = "v")
      .select("key", "v", "label").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(salted === plain)
    assert(plain.count(_._1 == "hot") === 50)
  }

  test("saltedJoin: balances reducer partitions on a skewed key") {
    // 60% of the big side shares one hot key. With AQE off and broadcast
    // disabled (the regime the operator exists for — AQE skew handling
    // unavailable, dim broadcast-ineligible) the plain shuffle join puts
    // the whole hot key in ONE reducer; salting spreads it saltFactor
    // ways. Measured as max rows in any post-join partition.
    val conf = spark.conf
    val saved = Seq("spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.shuffle.partitions").map(k => k -> conf.get(k))
    try {
      conf.set("spark.sql.adaptive.enabled", "false")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.shuffle.partitions", "32")
      val big = spark.range(0, 100000).select(
        when(col("id") % 10 < 6, lit(0L)).otherwise(col("id") % 1000)
          .as("key"), col("id").as("v"))
      val dim = spark.range(0, 1000).select(col("id").as("key"),
        (col("id") * 2).as("payload")).hint("shuffle_hash")
      def maxPart(df: org.apache.spark.sql.DataFrame): Int =
        df.rdd.mapPartitions(it => Iterator(it.size)).collect().max
      val plainMax = maxPart(big.join(dim, Seq("key")))
      val saltedMax = maxPart(SkewJoin.saltedJoin(big, dim, Seq("key"),
        saltFactor = 16, saltSource = "v"))
      // hot key = 60k rows: plain keeps them in one reducer (max ≥ 60k);
      // salted shards are ~3.75k each — even with two shards hashing to
      // the same reducer the max partition drops ≥ 4×
      assert(plainMax >= 60000, s"hot key not concentrated: $plainMax")
      assert(saltedMax * 4 <= plainMax,
        s"salting did not balance reducers: plain=$plainMax salted=$saltedMax")
    } finally saved.foreach { case (k, v) => conf.set(k, v) }
  }

  test("bloomPrune.semiJoin: identical result to a plain left-semi join") {
    val big = (1 to 2000).map(i => (i.toLong % 97, i.toLong)).toDF("k", "v")
    val small = Seq(3L, 17L, 42L, 96L, 1234L).toDF("sk") // 1234 matches nothing
    val plain = big.join(small.select(col("sk").as("k")), Seq("k"), "left_semi")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bloomed = BloomPrune.semiJoin(big, "k", small, "sk",
      expectedItems = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bloomed === plain)
    assert(plain.nonEmpty)
  }

  test("rangeJoin.byTime: exact [start, end) semantics across buckets") {
    val intervals = Seq(
      (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00"), "w1"),
      (1L, ts("2024-01-01 23:00:00"), ts("2024-01-02 01:00:00"), "w2"), // crosses bucket
      (2L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:00:00"), "w3")  // empty
    ).toDF("key", "start", "end", "win")
    val points = Seq(
      (1L, ts("2024-01-01 10:00:00"), "inside-at-start"),
      (1L, ts("2024-01-01 11:00:00"), "at-end-excluded"),
      (1L, ts("2024-01-02 00:30:00"), "inside-cross"),
      (2L, ts("2024-01-01 10:00:00"), "empty-interval")
    ).toDF("key", "pts", "label")
    val got = RangeJoin.byTime(intervals, points, Seq("key"),
      "start", "end", "pts", bucketSeconds = 3600)
      .select("win", "label").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === Set(("w1", "inside-at-start"), ("w2", "inside-cross")))
  }

  test("funnel: order matters, each stage a subset of the previous") {
    // u1: full ordered funnel; u2: purchase BEFORE click (breaks order);
    // u3: view only
    val ev = Seq(
      (1L, "view", ts("2024-01-01 10:00:00")),
      (1L, "click", ts("2024-01-01 10:05:00")),
      (1L, "purchase", ts("2024-01-01 10:10:00")),
      (2L, "purchase", ts("2024-01-01 09:00:00")),
      (2L, "view", ts("2024-01-01 10:00:00")),
      (2L, "click", ts("2024-01-01 10:05:00")),
      (3L, "view", ts("2024-01-01 10:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val f = Funnel.funnelCounts(ev, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(f("step1_view") === 3L)
    assert(f("step2_click") === 2L)     // users 1 and 2
    assert(f("step3_purchase") === 1L)  // only user 1 purchased AFTER click
  }
}
