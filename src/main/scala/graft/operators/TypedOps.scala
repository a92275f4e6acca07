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
}
