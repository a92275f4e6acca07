package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) storage layout: sort files along an
  * interleaved-bit curve over TWO columns so parquet min/max stats
  * prune on BOTH dimensions.
  *
  * The MergeTree analogue ([[MergeTreeWriter]]) sorts by one key
  * chain — file skipping works for the leading column only; a filter
  * on the second column alone must read every file. Interleaving the
  * bits of both (normalized) columns makes each file cover a small
  * square-ish region of the 2-D value space, so a selective predicate
  * on EITHER column overlaps only ~√(files) of them. This is the
  * standard multi-dimensional layout for 100 TB fact tables queried
  * along more than one axis (Delta/Iceberg expose the same idea as
  * OPTIMIZE ZORDER BY).
  *
  * All arithmetic is exact integer math on longs — normalization is a
  * floor-divided affine map onto [0, 2^bits), interleaving is 2·bits
  * codegen'd shift/mask terms — so an external engine replays the
  * z-value bit-for-bit (the DuckDB oracle does).
  */
object ZOrderLayout {

  /** Exact floor division (numerator divisible by construction). */
  private def floorDiv(v: Column, w: Column): Column =
    ((v - pmod(v, w)) / w).cast("long")

  /** Interleave the low `bits` bits of non-negative longs `a` (even
    * positions) and `b` (odd positions) into one long. */
  def interleaveBits(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    (0 until bits).flatMap { i =>
      Seq(shiftleft(shiftrightunsigned(a, i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftrightunsigned(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Map `v` from [minV, maxV] onto [0, 2^bits) by exact integer
    * arithmetic: (v − min)·(2^bits − 1) div (max − min). Degenerate
    * ranges (max == min) map to 0. Caller guarantees
    * (max − min)·(2^bits − 1) fits a long (true for any 32-bit-ranged
    * column at bits ≤ 16). */
  def normalize(v: Column, minV: Column, maxV: Column, bits: Int): Column =
    when(maxV === minV, lit(0L)).otherwise(
      floorDiv((v - minV) * lit((1L << bits) - 1), maxV - minV))

  /** Z-value of two long columns given their min/max stats columns. */
  def zValue(a: Column, aMin: Column, aMax: Column,
      b: Column, bMin: Column, bMax: Column, bits: Int = 16): Column =
    interleaveBits(
      normalize(a, aMin, aMax, bits), normalize(b, bMin, bMax, bits), bits)

  /** Write `df` into `nFiles` parquet files z-ordered on two long-typed
    * columns: one stats aggregate (4 longs to the driver — metadata,
    * not data), then range-repartition + sort along the curve. Each
    * output file ends up with tight min/max on BOTH columns. */
  def writeZOrdered(df: DataFrame, c1: String, c2: String, path: String,
      nFiles: Int, bits: Int = 16): Unit = {
    val r = df.agg(min(col(c1)).cast("long"), max(col(c1)).cast("long"),
      min(col(c2)).cast("long"), max(col(c2)).cast("long")).head()
    val z = zValue(
      col(c1).cast("long"), lit(r.getLong(0)), lit(r.getLong(1)),
      col(c2).cast("long"), lit(r.getLong(2)), lit(r.getLong(3)), bits)
    df.withColumn("_z", z)
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }
}
