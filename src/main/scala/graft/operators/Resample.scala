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

  /** Daily LINEAR INTERPOLATION: for every (entity, day-boundary) grid
    * point, the value lerped between the entity's latest event at or
    * before the point and its earliest event at or after it —
    * boundary-exact gap filling for slowly-varying signals (sensor
    * state, account balances) where forward-fill staircases.
    *
    * Built from the SAME native as-of operator run in both directions
    * (backward then forward — two merge passes, O(1) state each); the
    * lerp is a fixed-order IEEE double expression, so any engine
    * computing it reproduces the result bit-for-bit. Endpoint policy:
    * before the first event → that event's value (back-fill), after
    * the last → forward-fill, no events at all → null. */
  def dailyInterpolate(events: DataFrame, keyCol: String, timeCol: String,
      tieBreak: String, valueCol: String): DataFrame = {
    val bounds = events.agg(
      date_trunc("day", min(col(timeCol))).as("mn"),
      date_trunc("day", max(col(timeCol))).as("mx"))
    val days = bounds.select(
      explode(expr("sequence(mn, mx, interval 1 day)")).as("day"))
    val grid = events.select(col(keyCol)).distinct()
      .crossJoin(broadcast(days))
    val dedupW = Window.partitionBy(col(keyCol), col(timeCol))
      .orderBy(col(tieBreak).desc)
    val rd = events.withColumn("_rn", row_number().over(dedupW))
      .filter(col("_rn") === 1).drop("_rn")
    val prev = rd.select(col(keyCol).as("_pk"),
      col(timeCol).as("_p_ts"), col(valueCol).as("_p_val"))
    val nxt = rd.select(col(keyCol).as("_nk"),
      col(timeCol).as("_n_ts"), col(valueCol).as("_n_val"))
    val withPrev = graft.plans.AsOfJoinNative.leftAsOf(grid, prev,
      leftKey = keyCol, rightKey = "_pk", leftTime = "day",
      rightTime = "_p_ts", carry = Seq("_p_ts", "_p_val"))
    val both = graft.plans.AsOfJoinNative.leftAsOf(withPrev, nxt,
      leftKey = keyCol, rightKey = "_nk", leftTime = "day",
      rightTime = "_n_ts", carry = Seq("_n_ts", "_n_val"),
      direction = "forward")
    val (tp, tn, td) = (unix_micros(col("_p_ts")),
      unix_micros(col("_n_ts")), unix_micros(col("day")))
    val lerp = when(col("_p_ts").isNull && col("_n_ts").isNull,
        lit(null).cast("double"))
      .when(col("_p_ts").isNull, col("_n_val"))
      .when(col("_n_ts").isNull, col("_p_val"))
      .when(tn === tp, col("_p_val"))
      .otherwise(col("_p_val") + (col("_n_val") - col("_p_val")) *
        ((td - tp).cast("double") / (tn - tp).cast("double")))
    both.select(col(keyCol), col("day"),
      round(lerp, 4).as("value_interp"))
  }
}
