package graft.operators

import graft.operators.Ckpt.CkptOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Multi-touch revenue attribution — the model FAMILY beside q175's
  * single last-touch rule: first-touch, linear, and U-shaped
  * (position-based 40/20/40) credit for every (purchase, prior-touch)
  * pair, reported as revenue per touch channel under each model side
  * by side. Seeing the models disagree is the point: channel-budget
  * decisions that flip across rules are artifacts, not signal.
  *
  * Scale shape: the pair relation joins purchases to SAME-USER prior
  * touches — bounded by per-user history length, shuffled once on the
  * user key; per-purchase ranks window over purchase-id partitions
  * (purchase-keyed, high cardinality — never a corpus window). Credit
  * ratios are identical double expressions; credit × revenue rounds
  * to 6 dp and sums in DECIMAL per channel.
  */
object Attribution {

  /** Returns (touch_type, n_credited_purchases, rev_first, rev_linear,
    * rev_ushaped) ordered by touch_type. Purchases with no prior touch
    * carry no attributable revenue here (q175's 'none' bucket owns
    * that mass). */
  def models(events: DataFrame, touchTypes: Seq[String]): DataFrame = {
    val ev = events.withColumn("ts", date_trunc("second", col("ts")))
    val touches = ev.filter(col("event_type").isin(touchTypes: _*))
      .select(col("user_id"), col("ts").as("tts"),
        col("event_id").as("tid"), col("event_type").as("touch_type"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("pts"),
        col("event_id").as("pid"),
        col("value").cast(DecimalType(18, 4)).as("rev"))
    val pairs = purchases.join(touches, "user_id")
      .filter(col("tts") < col("pts"))
    val wOrd = Window.partitionBy("pid").orderBy(col("tts"), col("tid"))
    val wAll = Window.partitionBy("pid")
    val ranked = pairs
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("n", count(lit(1)).over(wAll))

    val cFirst = when(col("rn") === 1, lit(1.0)).otherwise(lit(0.0))
    val cLinear = lit(1.0) / col("n").cast("double")
    val cU = when(col("n") === 1, lit(1.0))
      .when(col("n") === 2, lit(0.5))
      .when(col("rn") === 1 || col("rn") === col("n"), lit(0.4))
      .otherwise(lit(0.2) / (col("n").cast("double") - 2.0))

    def credited(c: org.apache.spark.sql.Column) =
      round(col("rev").cast("double") * c, 6).cast(DecimalType(28, 6))

    ranked
      .select(col("touch_type"), col("pid"),
        credited(cFirst).as("cf"), credited(cLinear).as("cl"),
        credited(cU).as("cu"))
      .groupBy("touch_type")
      .agg(countDistinct(col("pid")).as("n_credited_purchases"),
        round(sum(col("cf")).cast("double"), 2).as("rev_first"),
        round(sum(col("cl")).cast("double"), 2).as("rev_linear"),
        round(sum(col("cu")).cast("double"), 2).as("rev_ushaped"))
      .orderBy("touch_type")
  }

  /** Exact Shapley-value channel attribution (the game-theoretic
    * gold standard the heuristic models above approximate): the
    * coalition value v(S) = conversions among users whose pre-purchase
    * exposure set ⊆ S, and each channel's Shapley value is its exact
    * marginal-contribution average. With |channels| = n small (the
    * real-world case), v lives on a 2ⁿ-row frame built from ONE
    * corpus scan (per-user exposure bitmask → mask histogram), so the
    * factorial sum is exact — no permutation sampling. Efficiency
    * holds by construction: Σ φ_i = v(full) − v(∅).
    * Returns (channel, shapley) ordered by channel; shapley is in
    * conversion units, rounded 6. */
  def shapley(events: DataFrame, channels: Seq[String]): DataFrame = {
    val n = channels.size
    require(n >= 1 && n <= 8, "exact Shapley needs a small channel set")
    val ev = events.withColumn("ts", date_trunc("second", col("ts")))
    val firstP = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id").agg(min(col("ts")).as("pts"))
    val bit = channels.zipWithIndex.map { case (c, i) =>
      max(when(col("event_type") === c, lit(1L << i)).otherwise(0L))
        .as(s"b$i")
    }
    val masks = ev.join(firstP, "user_id")
      .filter(col("ts") < col("pts")
        || col("event_type") === "purchase") // keep converters w/o touches
      .groupBy("user_id")
      .agg(bit.head, bit.tail: _*)
      .select(channels.indices.map(i => col(s"b$i"))
        .reduce(_ + _).as("mask"))
      .groupBy("mask").agg(count(lit(1)).as("m"))
    val spark = events.sparkSession
    val subsets = spark.range(1L << n).select(col("id").as("s"))
    val v = subsets.join(broadcast(masks),
        col("mask").bitwiseAND(col("s")) === col("mask"), "left")
      .groupBy("s").agg(sum(coalesce(col("m"), lit(0L))).as("v"))
      .graftCheckpoint(true) // 2^n rows; joined against itself per channel
    // w(s) = s!(n-1-s)!/n! as literals — exact rationals in double
    def fact(x: Int): Double = (1 to x).foldLeft(1.0)(_ * _)
    val terms = channels.zipWithIndex.map { case (c, i) =>
      val bitI = 1L << i
      v.as("a").join(v.as("b"),
          col("a.s").bitwiseAND(lit(bitI)) === 0L
            && col("b.s") === col("a.s").bitwiseOR(lit(bitI)))
        .select(lit(c).as("channel"),
          round((col("b.v") - col("a.v")).cast("double") *
            channels.indices.foldLeft(lit(0.0)) { (acc, sz) =>
              when(bit_count(col("a.s")) === sz,
                lit(fact(sz) * fact(n - 1 - sz) / fact(n))).otherwise(acc)
            }, 9).cast(DecimalType(28, 9)).as("t"))
    }.reduce(_ unionAll _)
    terms.groupBy("channel")
      .agg(round(sum(col("t")).cast("double"), 6).as("shapley"))
      .orderBy("channel")
  }

  /** Markov removal-effect attribution (the chain-based model beside
    * the heuristics and [[shapley]]): journeys are per-user touch
    * sequences start → t₁ → … → t_k → conv/null (conv iff the user
    * ever purchased; users with no touches are out of scope), the
    * first-order transition matrix is integer-ppm exact, and each
    * channel's value is how much the absorption probability P(conv |
    * start) drops when that channel is knocked out (its state forced
    * to 0 — paths through it die). Absorption runs `iters` rounds of
    * value iteration ENTIRELY in integer parts-per-billion with
    * truncating division (Java long `/` ≡ DuckDB `//` on
    * non-negatives), so both engines replay every scenario
    * bit-for-bit — a fixed-iteration value, not the analytic fixed
    * point (document: touch chains longer than `iters` contribute no
    * mass, identically in both engines). The matrix is
    * metadata-sized, so the iteration is driver-side (the
    * [[graft.operators.Pca]] precedent); the corpus pays one scan +
    * one user-keyed window. Returns (channel, base_ppb, removed_ppb,
    * removal_effect, share) ordered by channel; share is each
    * effect's fraction of the 6-dp effect total (null if all effects
    * are 0). */
  def markovRemoval(events: DataFrame, touchTypes: Seq[String],
      iters: Int = 16): DataFrame = {
    require(iters >= 1 && touchTypes.nonEmpty)
    val spark = events.sparkSession
    import spark.implicits._
    val ev = events.withColumn("ts", date_trunc("second", col("ts")))
    val conv = ev.filter(col("event_type") === "purchase")
      .select(col("user_id")).distinct()
      .withColumn("__c", lit(true))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
    val seq = ev.filter(col("event_type").isin(touchTypes: _*))
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("st"))
      .withColumn("rn", row_number().over(w))
      .withColumn("nxt", lead("st", 1).over(w))
      .join(conv, Seq("user_id"), "left")
      .withColumn("absorb",
        when(col("__c").isNotNull, "conv").otherwise("null"))
    val trans = seq
      .select(when(col("rn") === 1, lit("start")).otherwise(null)
        .as("f0"), col("st"), col("nxt"), col("absorb"))
      .select(explode(array(
        struct(col("f0").as("f"), col("st").as("t")),
        struct(col("st").as("f"),
          coalesce(col("nxt"), col("absorb")).as("t")))).as("p"))
      .filter(col("p.f").isNotNull)
      .groupBy(col("p.f").as("from_state"), col("p.t").as("to_state"))
      .agg(count(lit(1)).as("n"))
    val wRow = Window.partitionBy("from_state")
    val tr = trans
      .withColumn("__tot", sum("n").over(wRow)) // state-grid window
      .select(col("from_state"), col("to_state"),
        expr("(n * 1000000) div __tot").as("ppm"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val states = (tr.map(_._1) ++ tr.map(_._2)).distinct.sorted

    def absorb(removed: Option[String]): Long = {
      var a = states.map(s =>
        s -> (if (s == "conv") 1000000000L else 0L)).toMap
      for (_ <- 1 to iters) {
        val upd = tr.groupBy(_._1).map { case (f, rows) =>
          f -> rows.map { case (_, t, ppm) => ppm * a(t) }.sum / 1000000L
        }
        a = states.map { s =>
          s -> (if (s == "conv") 1000000000L
          else if (s == "null" || removed.contains(s)) 0L
          else upd.getOrElse(s, 0L))
        }.toMap
      }
      a.getOrElse("start", 0L)
    }

    val base = absorb(None)
    val effects = touchTypes.sorted.map { c =>
      val rem = absorb(Some(c))
      val eff = BigDecimal((base - rem).toDouble / base.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      (c, base, rem, eff)
    }
    val te = effects.map(_._4).sum
    effects.map { case (c, b, r, e) =>
      (c, b, r, e.toDouble,
        if (te > 0) Some(BigDecimal(e.toDouble / te.toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        else None)
    }.toDF("channel", "base_ppb", "removed_ppb", "removal_effect",
      "share").orderBy("channel")
  }
}
