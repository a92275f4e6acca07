package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Typed `Dataset[T]` surface — the case-class/Encoder tier of the API
  * (the brief's "Dataset[T] where type safety helps"): genuinely
  * imperative per-group logic expressed with `groupByKey` + `mapGroups`
  * instead of window-function algebra.
  *
  * The example operator — longest strictly-increasing value run per
  * user in event-time order — HAS a declarative twin (lag-compare →
  * running run-ids → max run length; that twin is the DuckDB oracle),
  * but stands in for the class of per-group programs that don't:
  * custom state machines, legacy scoring code, sequence models.
  *
  * Scale notes: `mapGroups` shuffles once on the key and materializes
  * ONE GROUP at a time (here: one user's events — bounded in any
  * per-entity workload; a heavy-hitter entity wants the window form
  * instead). The in-group sort is per-group work, not a global sort.
  * Kryo-free case-class Encoders keep rows in Tungsten format until
  * the group iterator is consumed. */
object TypedOps {

  case class Ev(user_id: Long, ts_us: Long, event_id: Long, value: Double)
  case class Streak(user_id: Long, n_events: Long, longest_streak: Long)

  /** (user, event count, longest strictly-increasing value streak) —
    * events ordered by (event time, event id). */
  def longestIncreasingStreak(events: DataFrame): Dataset[Streak] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("value"))
      .as[Ev]
      .groupByKey(_.user_id)
      .mapGroups { (uid, it) =>
        val evs = it.toArray.sortBy(e => (e.ts_us, e.event_id))
        var best = 1L
        var cur = 1L
        var i = 1
        while (i < evs.length) {
          cur = if (evs(i).value > evs(i - 1).value) cur + 1 else 1L
          if (cur > best) best = cur
          i += 1
        }
        Streak(uid, evs.length.toLong, if (evs.isEmpty) 0L else best)
      }
  }

  case class Moments(n: Long, s1: Long, s2: Long)

  /** Typed `Aggregator` — the Encoder-based aggregation tier, beside
    * the four Catalyst `TypedImperativeAggregate`s (MG/CMS/top-k/HLL):
    * exact integer moments (n, Σc, Σc²) over a cents-valued column.
    * Integer moments make the aggregate associative, commutative and
    * layout-independent — no Welford float drift, and mean/variance
    * derive EXACTLY afterwards, so the whole thing replays in an ANSI
    * engine (the float-streaming Welford form would not).
    *
    * Scale: Aggregator plans as a TypedAggregateExpression with
    * partial+final aggregation — map-side combine like any builtin;
    * O(1) state per group. */
  val momentsAgg: org.apache.spark.sql.expressions.Aggregator[
      Long, Moments, Moments] =
    new org.apache.spark.sql.expressions.Aggregator[Long, Moments, Moments] {
      def zero: Moments = Moments(0L, 0L, 0L)
      def reduce(b: Moments, a: Long): Moments =
        Moments(b.n + 1, b.s1 + a, b.s2 + a * a)
      def merge(x: Moments, y: Moments): Moments =
        Moments(x.n + y.n, x.s1 + y.s1, x.s2 + y.s2)
      def finish(r: Moments): Moments = r
      def bufferEncoder: org.apache.spark.sql.Encoder[Moments] =
        org.apache.spark.sql.Encoders.product[Moments]
      def outputEncoder: org.apache.spark.sql.Encoder[Moments] =
        org.apache.spark.sql.Encoders.product[Moments]
    }

  /** Per-group exact mean/variance through [[momentsAgg]]: the value is
    * quantized to integer cents (exact for 2dp money), moments
    * aggregate exactly, and the two floating divisions at the end run
    * in a fixed order — deterministic and oracle-comparable. */
  def typedMoments(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(momentsAgg.toColumn.name("m"))
      .toDF("event_type", "m")
      .select(col("event_type"), col("m.n").as("n_events"),
        round((col("m.s1").cast("double") / col("m.n")) / 100.0, 6)
          .as("mean_value"),
        round((col("m.s2").cast("double") / col("m.n")
          - (col("m.s1").cast("double") / col("m.n"))
            * (col("m.s1").cast("double") / col("m.n"))) / 10000.0, 6)
          .as("var_value"))
  }
}
