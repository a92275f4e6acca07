package graft.etl

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Z-order layout: interleave correctness against hand-computed bit
  * patterns, and the pruning property the curve exists for — a
  * selective predicate on the SECOND dimension overlaps fewer files
  * than under a linear sort. */
class ZOrderLayoutSpec extends SparkSpec {

  test("interleaveBits matches hand-computed Morton codes") {
    import spark.implicits._
    // a = 0b101 → bits 0,4; b = 0b011 → bits 1,3 ⇒ 0b11011 = 27
    val out = Seq((5L, 3L)).toDF("a", "b")
      .select(ZOrderLayout.interleaveBits(col("a"), col("b"), 3).as("z"))
      .head().getLong(0)
    assert(out === 27L)
    val zero = Seq((0L, 0L)).toDF("a", "b")
      .select(ZOrderLayout.interleaveBits(col("a"), col("b"), 16).as("z"))
      .head().getLong(0)
    assert(zero === 0L)
  }

  test("normalize maps degenerate ranges to 0 and endpoints to bounds") {
    import spark.implicits._
    val d = Seq((0L, 0L, 100L), (100L, 0L, 100L), (7L, 7L, 7L))
      .toDF("v", "lo", "hi")
    val got = d.select(ZOrderLayout.normalize(
      col("v"), col("lo"), col("hi"), 16).as("n"))
      .collect().map(_.getLong(0)).toSeq
    assert(got === Seq(0L, 65535L, 0L))
  }

  /** Files whose [min,max] span of `c` overlaps [lo, hi]. */
  private def overlapping(path: String, c: String, lo: Long,
      hi: Long): Long = {
    val back = spark.read.parquet(path)
      .select(input_file_name().as("f"), col(c))
    back.groupBy("f")
      .agg(min(col(c)).as("mn"), max(col(c)).as("mx"))
      .filter(col("mn") <= hi && col("mx") >= lo)
      .count()
  }

  test("z-order prunes on the second dimension; linear sort cannot") {
    val o = Tables.orders(spark, sf()).select(
      col("o_orderkey"), col("o_custkey"),
      floor(col("o_totalprice")).cast("long").as("price_l"))
    val zPath = s"${sys.props("java.io.tmpdir")}/graft_spec_zorder"
    val linPath = s"${sys.props("java.io.tmpdir")}/graft_spec_linear"
    ZOrderLayout.writeZOrdered(o, "o_custkey", "price_l", zPath, nFiles = 8)
    o.repartitionByRange(8, col("o_custkey"), col("price_l"))
      .sortWithinPartitions("o_custkey", "price_l")
      .write.mode("overwrite").parquet(linPath)
    val r = o.agg(min(col("price_l")), max(col("price_l"))).head()
    val (lo, hi) = (r.getLong(0), r.getLong(1))
    val width = (hi - lo) / 8
    val bandLo = lo + 3 * width
    val bandHi = bandLo + width
    val zFiles = overlapping(zPath, "price_l", bandLo, bandHi)
    val linFiles = overlapping(linPath, "price_l", bandLo, bandHi)
    // linear layout leads on custkey: every file spans ~the full price
    // range; the curve bounds both dimensions per file
    assert(zFiles < linFiles,
      s"z-order overlapped $zFiles files vs linear $linFiles")
    // both layouts hold the same rows
    assert(spark.read.parquet(zPath).count() === o.count())
  }
}
