package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketized interval lookup: equivalence with the naive non-equi
  * join (including negative and fractional values spanning bucket
  * boundaries), join-type behavior, and the plan property the rewrite
  * exists for (hash join, not nested-loop). */
class IntervalLookupSpec extends SparkSpec {

  private lazy val dim = {
    import spark.implicits._
    Seq(
      ("neg", -100L, -10L),
      ("low", -10L, 25L),
      ("mid", 25L, 26L),     // single-value interval
      ("empty", 50L, 50L),   // hi == lo: matches nothing
      ("high", 60L, 1000L),
    ).toDF("name", "lo", "hi")
  }

  private lazy val facts = {
    import spark.implicits._
    // values straddle bucket boundaries (width 16 below) and include
    // negative fractionals, where cast-truncation would mis-bucket
    Seq(1L -> -100.0, 2L -> -10.5, 3L -> -0.5, 4L -> 0.0, 5L -> 24.999,
      6L -> 25.0, 7L -> 25.5, 8L -> 26.0, 9L -> 55.0, 10L -> 60.0,
      11L -> 999.999, 12L -> 1000.0)
      .toDF("id", "v")
  }

  private def naive = facts.join(dim,
    col("v") >= col("lo") && col("v") < col("hi"))
    .select("id", "name")

  test("lookup matches the naive non-equi join for every bucket width") {
    val want = naive.collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    for (w <- Seq(1L, 7L, 16L, 1000L)) {
      val got = IntervalLookup.lookup(facts, "v", dim, "lo", "hi", w)
        .select("id", "name").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got === want, s"bucketWidth=$w")
    }
    // sanity on the fixture itself: boundary + sign cases present
    assert(want.contains((1L, "neg")) && want.contains((3L, "low")) &&
      want.contains((6L, "mid")) && !want.exists(_._2 == "empty") &&
      want.contains((10L, "high")) && !want.contains((12L, "high")))
  }

  test("left_outer keeps unmatched facts with null dim columns") {
    val out = IntervalLookup.lookup(facts, "v", dim, "lo", "hi", 16L,
      joinType = "left_outer")
    // 26.0 (hi of [25,26) is exclusive), 55.0, and 1000.0 fall in no
    // interval
    val unmatched = out.filter(col("name").isNull)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(unmatched === Set(8L, 9L, 12L))
    assert(out.count() === facts.count())
  }

  test("plans as a broadcast HASH join, never nested-loop") {
    val plan = IntervalLookup.lookup(facts, "v", dim, "lo", "hi", 16L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    // the naive predicate really does plan as nested-loop — the rewrite
    // is doing something
    val naivePlan = naive.queryExecution.executedPlan.toString
    assert(naivePlan.contains("BroadcastNestedLoopJoin"))
  }
}
