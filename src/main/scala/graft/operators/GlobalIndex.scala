package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Contiguous 0-based global row index in a total key order — WITHOUT
  * the single-partition window a naive `row_number().over(orderBy(k))`
  * plans (which funnels the whole corpus through one task; see the
  * scale note on [[graft.queries.PipelineQueries.trainOrder]]).
  *
  * This is the "assign every training sample its position" primitive a
  * shard manifest / curriculum schedule needs at corpus scale. Shape:
  *
  *   1. `repartitionByRange(nRanges, k)` — one range shuffle; partition
  *      p holds a contiguous key range, all ranges processed in
  *      parallel.
  *   2. `sortWithinPartitions(k)` + `monotonically_increasing_id()` —
  *      the id's low 33 bits are exactly the row's 0-based position in
  *      its sorted partition (Spark's per-partition counter), its high
  *      bits the partition id: a LOCAL rank with zero additional
  *      shuffle and no window exchange.
  *   3. One tiny aggregate (`nRanges` rows, collected + folded into a
  *      literal lookup) turns per-range counts into cumulative
  *      offsets; `global = offset(pid) + local` lifts local ranks to
  *      the total order.
  *
  * Determinism: with a UNIQUE key the result is a pure function of the
  * data — range boundaries (sampled, nondeterministic) only move rows
  * between partitions, never change a row's global rank. The frame is
  * pinned (eager localCheckpoint via [[graft.util.Checkpoints]]) so
  * the offset job and the output job see the SAME boundaries — without
  * it the two jobs could re-sample different ranges and mis-assign
  * entire blocks. The pin is released by the caller via the returned
  * handle, or by harness sweeps.
  *
  * Cost at 100 TB: one range shuffle + one in-partition sort (both
  * unavoidable for a total order), a bounded `nRanges`-row collect,
  * and one narrow projection. The naive window costs the same shuffle
  * PLUS a single-task sort of everything.
  */
object GlobalIndex {

  /** Returns (indexed frame, release handle for the pinned block).
    * `orderCol` must be unique per row for a deterministic result. */
  def withGlobalIndexPinned(df: DataFrame, orderCol: String,
      nRanges: Int, out: String = "global_idx")
      : (DataFrame, () => Unit) =
    withGlobalIndexPinned(df, Seq(col(orderCol)), nRanges, out)

  /** Multi-column / mixed-direction total orders (e.g. vocabulary id
    * assignment by `(cnt DESC, token ASC)`): the order expressions go
    * verbatim into both the range shuffle and the in-partition sort,
    * so partition p still holds a contiguous slice of the TOTAL order.
    * The combination must be unique per row for determinism. */
  def withGlobalIndexPinned(df: DataFrame, orderExprs: Seq[Column],
      nRanges: Int, out: String): (DataFrame, () => Unit) = {
    val (local, release) = graft.util.Checkpoints.pin(
      df.repartitionByRange(nRanges, orderExprs: _*)
        .sortWithinPartitions(orderExprs: _*)
        .withColumn("__mid", monotonically_increasing_id()))
    val pid = shiftrightunsigned(col("__mid"), 33)
    val localRank = col("__mid").bitwiseAND(lit((1L << 33) - 1))
    // nRanges rows — bounded driver materialization by construction
    val counts = local.groupBy(pid.as("p")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = counts.scanLeft((-1L, 0L)) {
      case ((_, acc), (p, n)) => (p, acc + n)
    }.init.zip(counts).map { case ((_, off), (p, _)) => p -> off }.toMap
    val indexed =
      if (offsets.size <= 64) {
        // literal CASE over ≤ 64 arms — codegen'd, no join
        val offExpr = offsets.foldLeft(lit(0L)) { case (acc, (p, off)) =>
          when(pid === lit(p), lit(off)).otherwise(acc)
        }
        local.withColumn(out, (offExpr + localRank).cast("long"))
      } else {
        // thousands of ranges: a literal CASE chain would sink codegen
        // — broadcast the tiny offset table instead (one hash probe)
        val spark = df.sparkSession
        import spark.implicits._
        val offDf = offsets.toSeq.toDF("__p", "__off")
        local.withColumn("__p", pid)
          .join(broadcast(offDf), "__p")
          .withColumn(out, (col("__off") + localRank).cast("long"))
          .drop("__p", "__off")
      }
    (indexed.drop("__mid"), release)
  }

  def withGlobalIndex(df: DataFrame, orderCol: String, nRanges: Int,
      out: String = "global_idx"): DataFrame =
    withGlobalIndexPinned(df, orderCol, nRanges, out)._1

  def withGlobalIndex(df: DataFrame, orderExprs: Seq[Column],
      nRanges: Int, out: String): DataFrame =
    withGlobalIndexPinned(df, orderExprs, nRanges, out)._1
}
