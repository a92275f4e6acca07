package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance (the materialized-view path): keep
  * a grouped aggregate current under appends by merging the history's
  * STATE with the delta's state — never rescanning history. This is
  * Spark's own partial-aggregation algebra (partial → merge → final)
  * made explicit and persistent: the state rows are the mergeable
  * partials, so "add a day of data to a year of totals" costs one pass
  * over the DELTA plus a |groups|-sized state shuffle, not a 100 TB
  * rescan. The same algebra is why the streaming lanes can maintain
  * these aggregates with bounded state.
  *
  * State carries algebraic summaries only (count + sum here — min/max
  * extend the same way); derived statistics (avg) are computed at FINAL
  * render from the state, never stored, so they stay exact under any
  * merge order.
  */
object IncrementalAgg {

  /** Mergeable state of `count(*), sum(valCol)` per group. */
  def aggState(df: DataFrame, groupCol: String, valCol: String): DataFrame =
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("_cnt"),
        sum(col(valCol).cast("decimal(38,8)")).as("_sum"))

  /** Merge any number of states: groups union, summaries add. The
    * merge is associative + commutative, so states can be combined in
    * any order and any grouping (daily → monthly → total). */
  def mergeStates(states: Seq[DataFrame]): DataFrame =
    states.reduce(_ unionByName _)
      .groupBy(col(states.head.columns.head))
      .agg(sum(col("_cnt")).as("_cnt"), sum(col("_sum")).as("_sum"))

  /** Final render: exact derived statistics from the state alone. */
  def render(state: DataFrame): DataFrame =
    state.select(
      col(state.columns.head),
      col("_cnt").as("cnt"),
      round(col("_sum").cast("double"), 2).as("total"),
      // double-divide (not decimal-divide) so the derived statistic is
      // the same IEEE operation any other engine's replay performs
      round(col("_sum").cast("double") / col("_cnt"), 6).as("avg"))
}
