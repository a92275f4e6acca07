package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The typed mapGroups streak fold: hand fixtures pin the semantics
  * (event-time order, event-id tie-break, strict increase, singleton
  * groups), and the real events table cross-checks the fold against
  * its declarative lag/run-id twin — the same twin the driver oracle
  * runs in DuckDB. */
class TypedOpsSpec extends SparkSpec {

  private def mkEvents(rows: Seq[(Long, Long, Long, Double)]) = {
    import spark.implicits._
    rows.toDF("user_id", "ts_us", "event_id", "value")
      .select(col("user_id"), timestamp_micros(col("ts_us")).as("ts"),
        col("event_id"), col("value"))
  }

  test("streaks reset on non-increase; events ordered by time") {
    val df = mkEvents(Seq(
      // user 1: 1,2,3 | 2 | 5,9  -> longest 3
      (1L, 10L, 1L, 1.0), (1L, 20L, 2L, 2.0), (1L, 30L, 3L, 3.0),
      (1L, 40L, 4L, 2.0), (1L, 50L, 5L, 5.0), (1L, 60L, 6L, 9.0),
      // user 2: equal values never extend a streak
      (2L, 10L, 7L, 4.0), (2L, 20L, 8L, 4.0), (2L, 30L, 9L, 4.0)))
    val got = TypedOps.longestIncreasingStreak(df).collect()
      .map(s => s.user_id -> (s.n_events, s.longest_streak)).toMap
    assert(got === Map(1L -> ((6L, 3L)), 2L -> ((3L, 1L))))
  }

  test("tied timestamps break by event_id; singleton group streak = 1") {
    val df = mkEvents(Seq(
      // same ts: order is event_id 1,2,3 -> values 5,1,2 -> longest 2
      (1L, 10L, 2L, 1.0), (1L, 10L, 3L, 2.0), (1L, 10L, 1L, 5.0),
      (2L, 10L, 4L, 7.0)))
    val got = TypedOps.longestIncreasingStreak(df).collect()
      .map(s => s.user_id -> (s.n_events, s.longest_streak)).toMap
    assert(got === Map(1L -> ((3L, 2L)), 2L -> ((1L, 1L))))
  }

  test("matches the declarative lag/run-id twin on the events table") {
    val ev = graft.Tables.events(spark, sf())
    val typed = TypedOps.longestIncreasingStreak(ev).toDF()
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val declarative = ev
      .withColumn("brk",
        when(col("value") > lag(col("value"), 1).over(w), 0L).otherwise(1L))
      .withColumn("run_id",
        sum(col("brk")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("run_id"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("user_id"))
      .agg(sum(col("len")).as("n_events"),
        max(col("len")).as("longest_streak"))
    assert(typed.exceptAll(declarative).isEmpty &&
      declarative.exceptAll(typed).isEmpty)
    assert(typed.count() > 0)
  }

  test("momentsAgg: hand moments, merge laws, and layout invariance") {
    import spark.implicits._
    // reduce semantics on a tiny fixture
    val m = Seq(3L, 5L, 7L).foldLeft(TypedOps.momentsAgg.zero)(
      TypedOps.momentsAgg.reduce)
    assert(m === TypedOps.Moments(3L, 15L, 83L))
    // merge is the coordinate-wise sum (associative + commutative)
    val a = TypedOps.Moments(2L, 8L, 34L)
    val b = TypedOps.Moments(1L, 7L, 49L)
    assert(TypedOps.momentsAgg.merge(a, b) ===
      TypedOps.momentsAgg.merge(b, a))
    assert(TypedOps.momentsAgg.merge(a, b) === m)
  }

  test("typedMoments equals the declarative aggregation, any layout") {
    val ev = graft.Tables.events(spark, sf())
    def run(df: org.apache.spark.sql.DataFrame) =
      TypedOps.typedMoments(df).collect().map(_.toSeq).toSet
    val base = run(ev)
    assert(base === run(ev.repartition(11)))
    val declarative = ev
      .select(col("event_type"),
        round(col("value") * 100).cast("long").as("c"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(col("c")).as("s1"), sum(col("c") * col("c")).as("s2"))
      .select(col("event_type"), col("n_events"),
        round((col("s1").cast("double") / col("n_events")) / 100.0, 6)
          .as("mean_value"),
        round((col("s2").cast("double") / col("n_events")
          - (col("s1").cast("double") / col("n_events"))
            * (col("s1").cast("double") / col("n_events"))) / 10000.0, 6)
          .as("var_value"))
      .collect().map(_.toSeq).toSet
    assert(base === declarative)
  }
}
