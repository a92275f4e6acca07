package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling: project an irregular event stream onto a
  * regular time grid with forward-fill — the "state of every entity at
  * every day boundary" query behind feature snapshots, billing cut-offs
  * and training-label materialization.
  *
  * Construction is Spark-first composition: the grid is
  * `sequence(min_day, max_day, 1 day)` exploded against the distinct
  * entity set (the grid IS the output size — nothing larger is ever
  * materialized; the day list broadcasts), and the fill is the NATIVE
  * as-of join ([[graft.plans.AsOfJoinNative]]) from grid points to the
  * latest event at or before each point — one merge pass, O(1) state,
  * reusing the custom operator as a building block. Entities with no
  * event yet carry nulls (no fabricated state).
  */
object Resample {

  /** Daily forward-fill: for every (entity, day-boundary) grid point,
    * the latest event row at or before it. `carry` columns come from
    * the event; the right side is deduplicated per (entity, time) by
    * highest `tieBreak` column so the fill is deterministic. */
  def dailyForwardFill(events: DataFrame, keyCol: String, timeCol: String,
      tieBreak: String, carry: Seq[String]): DataFrame = {
    val bounds = events.agg(
      date_trunc("day", min(col(timeCol))).as("mn"),
      date_trunc("day", max(col(timeCol))).as("mx"))
    val days = bounds.select(
      explode(expr("sequence(mn, mx, interval 1 day)")).as("day"))
    val entities = events.select(col(keyCol)).distinct()
    val grid = entities.crossJoin(broadcast(days))
    val dedupW = Window.partitionBy(col(keyCol), col(timeCol))
      .orderBy(col(tieBreak).desc)
    val rd = events.withColumn("_rn", row_number().over(dedupW))
      .filter(col("_rn") === 1).drop("_rn")
      .withColumnRenamed(keyCol, s"_r_$keyCol")
    graft.plans.AsOfJoinNative.leftAsOf(grid, rd,
      leftKey = keyCol, rightKey = s"_r_$keyCol",
      leftTime = "day", rightTime = timeCol, carry = carry)
  }
}
