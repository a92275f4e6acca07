package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** Daily resample/forward-fill on a hand stream: gap days carry the
  * last state, entities starting late carry nulls before first event,
  * grid covers the full global range for every entity. */
class ResampleSpec extends SparkSpec {

  import spark.implicits._

  private def ts(day: Int, hour: Int = 12): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:00:00")

  private val events = Seq(
    // user 1: events on days 1 and 4 — days 2,3 must carry day-1 state
    (10L, 1L, ts(1), 1.5), (11L, 1L, ts(4), 4.5),
    // user 2: first event on day 3 — days 1,2 must be null
    (20L, 2L, ts(3), 3.5),
  ).toDF("event_id", "user_id", "ts", "value")

  test("gaps forward-fill; pre-first-event days stay null") {
    val out = Resample.dailyForwardFill(events, "user_id", "ts",
      "event_id", Seq("event_id", "value")).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString.take(10)) ->
        (if (r.isNullAt(2)) null else Long.box(r.getLong(2)))).toMap
    // grid: days 1..4 (global range) × 2 users = 8 points; the day-D
    // boundary is midnight, so day-D events land on the D+1 boundary
    assert(out.size === 8)
    assert(out((1L, "2024-01-01")) === null) // midnight before 12:00 event
    assert(out((1L, "2024-01-02")) === 10L)
    assert(out((1L, "2024-01-03")) === 10L) // gap day carries state
    assert(out((1L, "2024-01-04")) === 10L) // day-4 event is after midnight
    assert(out((2L, "2024-01-01")) === null)
    assert(out((2L, "2024-01-03")) === null)
    assert(out((2L, "2024-01-04")) === 20L)
  }

  test("interpolation lerps between neighbors; endpoints fill flat") {
    val out = Resample.dailyInterpolate(events, "user_id", "ts",
      "event_id", "value").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString.take(10)) ->
        (if (r.isNullAt(2)) null else Double.box(r.getDouble(2)))).toMap
    assert(out.size === 8)
    // user 1: events (day1 12:00, 1.5) and (day4 12:00, 4.5) — 72h apart
    assert(out((1L, "2024-01-01")) === 1.5) // before first: back-fill
    // day-2 midnight is 12h past the day-1 event: 1.5 + 3.0 * 12/72
    assert(out((1L, "2024-01-02")) === 2.0)
    assert(out((1L, "2024-01-03")) === 3.0) // 36/72 of the way
    assert(out((1L, "2024-01-04")) === 4.0) // 60/72 of the way
    // user 2: single event — flat fill both directions
    assert(out((2L, "2024-01-01")) === 3.5)
    assert(out((2L, "2024-01-04")) === 3.5)
  }
}
