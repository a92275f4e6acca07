package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range-partitioned RUNNING TOTALS in a global order — WITHOUT the
  * single-partition window a naive
  * `sum(v).over(Window.orderBy(k))` plans (the whole frame through ONE
  * task; Spark even warns "No Partition Defined for Window"). The
  * [[GlobalIndex]] trick applied to prefix SUMS instead of ranks:
  *
  *   1. `repartitionByRange(nRanges, k)` — partition p holds a
  *      contiguous slice of the total order;
  *   2. a window PARTITIONED BY the physical partition id, ordered by
  *      k — per-range running sums computed in parallel (this window
  *      HAS a partition key, so no single-task funnel);
  *   3. one `nRanges`-row aggregate of per-range totals, folded
  *      driver-side into cumulative offsets; `cum = offset(pid) +
  *      localCum` lifts the local running sums to the global order.
  *
  * The output column is the EXCLUSIVE prefix sum (everything STRICTLY
  * before the row in `orderExprs` order) — add the row's own value for
  * the inclusive form. `orderExprs` must be a total order (unique per
  * row) for a deterministic result.
  *
  * Determinism across the two jobs (offsets + output): the
  * range-shuffled frame is PINNED (eager localCheckpoint) so both see
  * the same sampled range boundaries — the same contract as
  * [[GlobalIndex]]; release via the returned handle.
  *
  * Cost at 100 TB: one range shuffle (unavoidable for any global
  * order), parallel per-range windows, a bounded nRanges-row collect.
  * The naive global window costs the same shuffle PLUS a single-task
  * pass over everything. */
object PrefixSum {

  /** Returns (frame + `out` exclusive-prefix-sum column (long), release
    * handle for the pinned block). `value` must be integral (the
    * running total is exact 64-bit). */
  def withRunningTotalPinned(df: DataFrame, orderExprs: Seq[Column],
      value: Column, nRanges: Int, out: String)
      : (DataFrame, () => Unit) = {
    import org.apache.spark.sql.expressions.Window
    val (local, release) = graft.util.Checkpoints.pin(
      df.repartitionByRange(nRanges, orderExprs: _*)
        .withColumn("__pid", spark_partition_id()))
    val w = Window.partitionBy(col("__pid")).orderBy(orderExprs: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val localCum = coalesce(sum(value).over(w), lit(0L))
    // nRanges rows — bounded driver materialization by construction.
    // coalesce: a range whose values are ALL NULL sums to null, and a
    // bare getLong would NPE on the driver (the per-row window above
    // already null-guards the same way)
    val totals = local.groupBy(col("__pid"))
      .agg(coalesce(sum(value), lit(0L)).as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = totals.scanLeft((-1, 0L)) {
      case ((_, acc), (p, t)) => (p, acc + t)
    }.init.zip(totals).map { case ((_, off), (p, _)) => p -> off }.toMap
    val indexed =
      if (offsets.size <= 64) {
        // literal CASE over ≤ 64 arms — codegen'd, no join
        val offExpr = offsets.foldLeft(lit(0L)) { case (acc, (p, off)) =>
          when(col("__pid") === lit(p), lit(off)).otherwise(acc)
        }
        local.withColumn(out, (offExpr + localCum).cast("long"))
      } else {
        val spark = df.sparkSession
        import spark.implicits._
        val offDf = offsets.toSeq.toDF("__p", "__off")
        local.join(broadcast(offDf), col("__pid") === col("__p"))
          .withColumn(out, (col("__off") + localCum).cast("long"))
          .drop("__p", "__off")
      }
    (indexed.drop("__pid"), release)
  }

  def withRunningTotal(df: DataFrame, orderExprs: Seq[Column],
      value: Column, nRanges: Int, out: String): DataFrame =
    withRunningTotalPinned(df, orderExprs, value, nRanges, out)._1
}
