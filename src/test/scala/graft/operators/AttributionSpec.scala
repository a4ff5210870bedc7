package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AttributionSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int) = java.sql.Timestamp.valueOf(
    java.time.LocalDateTime.of(2024, 1, 1, 0, min))

  private def ev(id: Long, u: Long, t: String, min: Int, v: Double) =
    (id, u, t, ts(min), v)

  test("attribution models: 3-touch path splits 40/20/40 (U), " +
      "thirds (linear), all-to-first (first)") {
    val rows = Seq(
      ev(1, 7L, "view", 1, 0.0), ev(2, 7L, "click", 2, 0.0),
      ev(3, 7L, "signup", 3, 0.0), ev(4, 7L, "purchase", 9, 100.0))
    val out = Attribution.models(
      rows.toDF("event_id", "user_id", "event_type", "ts", "value"),
      Seq("view", "click", "signup")).collect()
      .map(r => r.getString(0) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out("view") == ((100.0, 33.33, 40.0)), s"$out")
    assert(out("click") == ((0.0, 33.33, 20.0)))
    assert(out("signup") == ((0.0, 33.33, 40.0)))
  }

  test("attribution models: single- and two-touch degenerate paths " +
      "give full / half credit; later touches never leak credit") {
    val rows = Seq(
      // user 1: one view then purchase 50
      ev(1, 1L, "view", 1, 0.0), ev(2, 1L, "purchase", 5, 50.0),
      // user 2: view, click, purchase 80
      ev(3, 2L, "view", 1, 0.0), ev(4, 2L, "click", 2, 0.0),
      ev(5, 2L, "purchase", 6, 80.0),
      // user 3: touch AFTER purchase only → no credit anywhere
      ev(6, 3L, "purchase", 1, 30.0), ev(7, 3L, "view", 5, 0.0))
    val out = Attribution.models(
      rows.toDF("event_id", "user_id", "event_type", "ts", "value"),
      Seq("view", "click", "signup")).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    // view: full 50 (u1) + first-of-two 80 (u2, first) / 40 linear /
    // 40 U-shaped(n=2 → .5)
    assert(out("view") == ((2L, 130.0, 90.0, 90.0)), s"$out")
    assert(out("click") == ((1L, 0.0, 40.0, 40.0)))
    assert(!out.contains("signup"))
    // u3's purchase credited nowhere: totals reconcile to 130
    assert(out.values.map(_._3).sum == 130.0)
  }

  test("shapley: hand-computed 3-user game — efficiency and the " +
      "null-player axiom hold exactly") {
    // u1 exposed {view} converts; u2 {view, click} converts;
    // u3 converts untouched. By hand: φ_view = 1.5, φ_click = 0.5,
    // φ_signup = 0 (null player); Σφ = v(full) − v(∅) = 2.
    val rows = Seq(
      (1L, "view", ts(1)), (1L, "purchase", ts(2)),
      (2L, "view", ts(1)), (2L, "click", ts(2)), (2L, "purchase", ts(3)),
      (3L, "purchase", ts(1)))
    val out = Attribution.shapley(
      rows.toDF("user_id", "event_type", "ts"),
      Seq("click", "signup", "view")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out == Map("view" -> 1.5, "click" -> 0.5, "signup" -> 0.0),
      s"$out")
  }

  test("shapley: symmetric channels receive identical credit") {
    // two users, each exposed to exactly one distinct channel
    val rows = Seq(
      (1L, "view", ts(1)), (1L, "purchase", ts(2)),
      (2L, "click", ts(1)), (2L, "purchase", ts(2)))
    val out = Attribution.shapley(
      rows.toDF("user_id", "event_type", "ts"),
      Seq("click", "signup", "view")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("view") == out("click"), s"$out")
    assert(out("signup") == 0.0)
    assert(math.abs(out.values.sum - 2.0) < 1e-9) // efficiency
  }

  test("every model conserves attributable revenue (columns sum to " +
      "the same total) on fixture data") {
    val out = Attribution.models(
      graft.Tables.events(spark, SfDir),
      Seq("view", "click", "signup")).collect()
    val tf = out.map(_.getDouble(2)).sum
    val tl = out.map(_.getDouble(3)).sum
    val tu = out.map(_.getDouble(4)).sum
    assert(math.abs(tf - tl) < 0.05 && math.abs(tl - tu) < 0.05,
      s"first $tf linear $tl ushaped $tu") // 6-dp credit rounding dust
  }

  test("markovRemoval: on a hand-built chain start->view->click->conv " +
      "both channels are total bottlenecks (effect 1, share 1/2)") {
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val rows =
      (1 to 10).flatMap(u => Seq(
        (u.toLong, u * 10L, "view", ts(1)),
        (u.toLong, u * 10L + 1, "click", ts(2)),
        (u.toLong, u * 10L + 2, "purchase", ts(3)))) ++
      (11 to 20).map(u => (u.toLong, u * 10L, "view", ts(1)))
    val df = rows.toDF("user_id", "event_id", "event_type", "ts")
    val out = Attribution.markovRemoval(df, Seq("view", "click"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    // half the journeys convert; base P = 0.5; removing either state
    // kills every converting path
    assert(out("view")._1 == 500000000L, s"$out")
    assert(out.values.forall(v => v._2 == 0L && v._3 == 1.0
      && v._4 == 0.5), s"$out")
  }

  test("markovRemoval: a channel never on a converting path has zero " +
      "removal effect") {
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val rows =
      (1 to 8).flatMap(u => Seq(
        (u.toLong, u * 10L, "view", ts(1)),
        (u.toLong, u * 10L + 1, "purchase", ts(2)))) ++
      (9 to 16).map(u => (u.toLong, u * 10L, "click", ts(1)))
    val df = rows.toDF("user_id", "event_id", "event_type", "ts")
    val out = Attribution.markovRemoval(df, Seq("view", "click"))
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(out("click") == 0.0 && out("view") == 1.0, s"$out")
  }
}
