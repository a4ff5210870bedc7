package graft.pipeline

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.GapFill

/** Behavior pins for the round-7 feature-pipeline operators: gap fill
  * (densify + ffill), leakage-safe target encoding, SFT assembly, and
  * the privacy audit. Tiny inline fixtures chosen so every edge the
  * oracle can't isolate (multi-day gaps, own-fold exclusion, turn
  * ordering, k/l boundaries) is asserted directly. */
class FeaturePipelineSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("GapFill: densifies the per-key span, ffills across multi-day gaps, keeps leading nulls") {
    val ev = Seq(
      // key 1: obs on day 1 and day 4 — days 2,3 are gaps filled with 10.0
      (1L, ts("2024-01-01 10:00:00"), 1L, 10.0),
      (1L, ts("2024-01-04 10:00:00"), 2L, 40.0),
      // key 1, day 1 has TWO obs: later ts wins the daily pick
      (1L, ts("2024-01-01 23:00:00"), 3L, 11.0),
      // key 2: single day — no grid expansion
      (2L, ts("2024-01-07 00:00:00"), 4L, 7.0)
    ).toDF("user_id", "ts", "event_id", "value")

    val out = GapFill.forwardFillDaily(ev, "user_id", "ts", "event_id",
      "value").orderBy("k", "day").collect()
    assert(out.length === 5) // 4 days for key 1 + 1 day for key 2
    val k1 = out.filter(_.getLong(0) == 1L)
    assert(k1.map(_.getAs[java.sql.Date]("day").toString).toSeq ===
      Seq("2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04"))
    // day 1 pick = the 23:00 observation (latest ts wins)
    assert(k1(0).getAs[Double]("v_filled") === 11.0)
    assert(k1(0).getAs[Boolean]("is_gap") === false)
    // gaps carry 11.0 forward and are flagged
    assert(k1(1).isNullAt(k1(1).fieldIndex("v")))
    assert(k1(1).getAs[Double]("v_filled") === 11.0)
    assert(k1(1).getAs[Boolean]("is_gap") === true)
    assert(k1(3).getAs[Double]("v_filled") === 40.0)
  }

  test("FeatureEncoding: out-of-fold mean excludes the row's own fold; smoothing shrinks to the prior") {
    val df = Seq(
      // cat A: fold 0 target 10, fold 1 target 20
      ("A", 0L, 10.0), ("A", 1L, 20.0),
      // cat B appears ONLY in fold 0: its fold-0 encoding has no
      // out-of-fold data and must collapse to the prior exactly
      ("B", 0L, 100.0)
    ).toDF("cat", "fold", "y")
    val enc = FeatureEncoding
      .kFoldTargetEncode(df, "cat", "y", "fold", smoothing = 10.0)
      .orderBy("cat", "fold").collect()
    val prior = (10.0 + 20.0 + 100.0) / 3
    // A/fold0 sees only A/fold1's 20.0: (20 + 10*prior)/(1 + 10)
    assert(enc(0).getAs[Double]("oof_mean") ===
      math.rint((20.0 + 10 * prior) / 11.0 * 1e6) / 1e6)
    // B/fold0: zero out-of-fold rows → exactly the prior
    assert(enc(2).getAs[Double]("oof_mean") ===
      math.rint(prior * 1e6) / 1e6)
  }

  test("Conversations: turns render in (ts, id) order and null text coalesces") {
    val msgs = Seq(
      (7L, ts("2024-01-01 00:00:02"), 2L, "assistant", "hi there"),
      (7L, ts("2024-01-01 00:00:01"), 1L, "user", "hello"),
      // same ts as id=2 — id breaks the tie
      (7L, ts("2024-01-01 00:00:02"), 3L, "user", null)
    ).toDF("conv", "ts", "id", "role", "text")
    val out = Conversations
      .assemble(msgs, "conv", "ts", "id", "role", "text").head()
    assert(out.getAs[String]("rendered") ===
      "user: hello\nassistant: hi there\nuser: ")
    assert(out.getAs[Long]("n_turns") === 3L)
  }

  test("Privacy: k and l boundaries are inclusive; summary counts rows in violating groups") {
    val df = Seq(
      // group (1,"x"): 3 rows, 2 sensitive values → k_anonymous at k=3,
      // NOT l_diverse at l=3
      (1, "x", 10L), (1, "x", 10L), (1, "x", 20L),
      // group (2,"y"): 1 row → violates both
      (2, "y", 30L)
    ).toDF("q1", "q2", "s")
    val audit = Privacy.kAnonymityAudit(df, Seq("q1", "q2"), "s", 3, 3)
    val rows = audit.orderBy("q1").collect()
    assert(rows(0).getAs[Boolean]("k_anonymous") === true)
    assert(rows(0).getAs[Boolean]("l_diverse") === false)
    assert(rows(1).getAs[Boolean]("k_anonymous") === false)
    val sum = Privacy.kAnonymitySummary(audit).head()
    assert(sum.getAs[Long]("k_achieved") === 1L)
    assert(sum.getAs[Long]("rows_at_risk") === 1L)
    assert(sum.getAs[Long]("rows_homogeneous") === 4L)
  }
}
