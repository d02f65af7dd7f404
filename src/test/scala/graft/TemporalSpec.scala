package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Temporal

/** Hand-computed edge semantics for the temporal joins: equal-timestamp
  * matches (>= semantics), no-match nulls, range-bound exclusivity, and
  * bin-boundary crossings. */
class TemporalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  private def events(rows: (Long, Long, Long, String, Double)*) =
    rows.toDF("event_id", "sec", "user_id", "event_type", "value")
      .selectExpr("event_id", "cast(timestamp_seconds(sec) as timestamp) as ts",
        "user_id", "event_type", "value")

  test("asof join: equal-ts match, latest-prior pick, null when none") {
    val ev = events(
      (1L, 100L, 1L, "view", 1.0),
      (2L, 100L, 1L, "purchase", 0.0), // equal ts → view 1 matches (>=)
      (3L, 200L, 1L, "view", 2.0),
      (4L, 300L, 1L, "purchase", 0.0), // → latest prior = view 3
      (5L, 300L, 2L, "purchase", 0.0)) // user 2 has no view → nulls
    val out = Temporal.asofJoin(
      ev.filter($"event_type" === "purchase"),
      ev.filter($"event_type" === "view"))
      .orderBy($"p_event_id")
      .collect()
    assert(out.map(r => (r.getLong(0),
      if (r.isNullAt(4)) -1L else r.getLong(4))).toSeq ==
      Seq((2L, 1L), (4L, 3L), (5L, -1L)))
  }

  test("asof join: NULL value on the matched row is NOT spliced from older rows") {
    // The matched view (latest prior) carries a NULL value; an older view
    // has a non-null one. All v_* fields must come from the SAME matched
    // row — v_value must be NULL, not the older row's 1.5.
    val ev = Seq(
      (1L, 100L, 1L, "view", Some(1.5)),
      (2L, 200L, 1L, "view", None: Option[Double]), // the match
      (3L, 300L, 1L, "purchase", Some(0.0)))
      .toDF("event_id", "sec", "user_id", "event_type", "value")
      .selectExpr("event_id", "cast(timestamp_seconds(sec) as timestamp) as ts",
        "user_id", "event_type", "value")
    val out = Temporal.asofJoin(
      ev.filter($"event_type" === "purchase"),
      ev.filter($"event_type" === "view")).collect()
    assert(out.length == 1)
    assert(out(0).getLong(4) == 2L, "must match the latest prior view")
    assert(out(0).isNullAt(5), "v_value must come from the matched row (NULL)")
  }

  test("asof join: exact-ts tie between two views picks max event_id") {
    val ev = events(
      (1L, 100L, 1L, "view", 1.0),
      (2L, 100L, 1L, "view", 2.0),
      (3L, 150L, 1L, "purchase", 0.0))
    val out = Temporal.asofJoin(
      ev.filter($"event_type" === "purchase"),
      ev.filter($"event_type" === "view")).collect()
    assert(out.length == 1 && out(0).getLong(4) == 2L
      && out(0).getDouble(5) == 2.0)
  }

  test("range join: inclusive start, exclusive end, bin-boundary pairs found") {
    val ev = events(
      (1L, 0L, 1L, "view", 0.0),
      (2L, 0L, 1L, "purchase", 0.0),    // gap 0 → in
      (3L, 599L, 1L, "purchase", 0.0),  // gap 599 → in (same bin)
      (4L, 600L, 1L, "purchase", 0.0),  // gap 600 = bound → OUT
      (5L, 550L, 1L, "view", 0.0),
      (6L, 650L, 1L, "purchase", 0.0),  // gap 100, crosses bin 0→1 → in
      (7L, 100L, 2L, "purchase", 0.0))  // other user → out
    val out = Temporal.rangeJoin(
      ev.filter($"event_type" === "view"),
      ev.filter($"event_type" === "purchase"), Temporal.RangeWindowSec)
      .select("v_event_id", "p_event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 2L), (1L, 3L), (5L, 3L), (5L, 4L), (5L, 6L)))
  }

  test("interval overlap join: symmetric, exact lengths, no bin duplicates") {
    // user 1: view at 100 opens [100, 700); purchases at 650 (overlap
    // 50s), 699 (1s), 700 (none — half-open), and 50 (view starts
    // inside purchase window: overlap 550s). user 2: no views.
    val ev = events(
      (1L, 100L, 1L, "view", 1.0),
      (2L, 650L, 1L, "purchase", 0.0),
      (3L, 699L, 1L, "purchase", 0.0),
      (4L, 700L, 1L, "purchase", 0.0),
      (5L, 50L, 1L, "purchase", 0.0),
      (6L, 90L, 2L, "purchase", 0.0))
    val out = Temporal.intervalOverlapJoin(
      ev.filter($"event_type" === "view"),
      ev.filter($"event_type" === "purchase"), 600L)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(out == Set(
      (1L, 2L, 50L * 1000000L),
      (1L, 3L, 1L * 1000000L),
      (1L, 5L, 550L * 1000000L)))
  }

  test("interp resample: observed days exact, gaps on the straight line") {
    val day = 86400L
    // type A observed on days 0, 1, 4 (counts 2, 3, 9): days 2 and 3 are
    // gaps on the line 3 → 9, i.e. 5.0 and 7.0
    val ev = events(
      (1L, 0L, 1L, "A", 200.0), (2L, 10L, 1L, "A", 200.0),
      (3L, day, 1L, "A", 200.0), (4L, day + 1, 1L, "A", 200.0),
      (5L, day + 2, 1L, "A", 200.0),
      (6L, 4 * day, 1L, "A", 200.0), (7L, 4 * day + 1, 1L, "A", 200.0),
      (8L, 4 * day + 2, 1L, "A", 200.0), (9L, 4 * day + 3, 1L, "A", 200.0),
      (10L, 4 * day + 4, 1L, "A", 200.0), (11L, 4 * day + 5, 1L, "A", 200.0),
      (12L, 4 * day + 6, 1L, "A", 200.0), (13L, 4 * day + 7, 1L, "A", 200.0),
      (14L, 4 * day + 8, 1L, "A", 200.0))
    val out = Temporal.interpResample(ev)
      .orderBy($"day").collect()
      .map(r => (r.getBoolean(2), r.getDouble(3)))
    assert(out.length == 5)
    assert(out.map(_._2).toSeq == Seq(2.0, 3.0, 5.0, 7.0, 9.0))
    assert(out.map(_._1).toSeq == Seq(false, false, true, true, false))
  }
}
