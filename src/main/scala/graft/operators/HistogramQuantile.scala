package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Histogram quantiles — the bounded-state approximate-quantile path
  * whose every intermediate value replays in an ANSI engine, unlike the
  * opaque KLL digest inside `percentile_approx` (which is deterministic
  * but has no cross-engine twin, hence q26's rows-only check).
  *
  * Shape: bucket each value into fixed-width integer bins → per-(group,
  * bin) counts (ONE shuffle, map-side combinable, ≤ nBins rows of state
  * per group) → per-group cumulative counts over the tiny bin table →
  * for each requested quantile pick the bin holding rank ceil(q·n) and
  * linearly interpolate inside it. Accuracy is bounded by the bin
  * width; state is bounded by the bin count — exactly the trade the
  * 100 TB quantile wants (the exact `percentile` collects every value
  * per group; this never holds more than the histogram).
  *
  * Determinism / oracle-exactness: ranks and cumulative counts are pure
  * integer arithmetic; the interpolation is a fixed-order IEEE
  * expression (one divide, one multiply, two adds) over exact integer
  * operands, so DuckDB replays it bit for bit. Quantiles are passed as
  * exact rationals (num, den), never as double literals.
  *
  * Reference analogue: the reference keeps no quantile surface at all
  * (SURVEY.md §2.4 — "no median/quantile"); this extends the A-family
  * the same way q21/q26 do, but with the sketch under the oracle gate.
  */
object HistogramQuantile {

  /** SQL fragment: floor division of integer expression `x` by positive
    * literal `d`. Spark's `DIV` truncates toward zero while DuckDB's
    * `//` floors, so binning negative units with `DIV` would silently
    * put them one bin off between the engines; flooring on the Spark
    * side makes the histograms identical for every sign. Pure built-in
    * integer arithmetic — stays inside whole-stage codegen. */
  def floorDivSql(x: String, d: Long): String = {
    require(d > 0, s"divisor must be positive, got $d")
    s"CASE WHEN ($x) >= 0 THEN ($x) DIV $d ELSE -((-($x) + $d - 1) DIV $d) END"
  }

  /** Per-group histogram quantile estimates.
    *
    * @param df       input
    * @param groupCol grouping column name (returned under the same name)
    * @param units    Column of integer-valued measurements in their
    *                 smallest exact unit (e.g. money in cents) —
    *                 integer units keep every count and rank exact in
    *                 both engines; negative values bin by FLOOR
    *                 division (see [[floorDivSql]]), so both engines
    *                 agree for every sign
    * @param binWidth histogram bin width in the same integer units
    * @param perUnit  how many integer units make one natural unit of the
    *                 returned estimate (100 for cents → dollars)
    * @param qs       quantiles as (label, numerator, denominator)
    * @return (groupCol, q_label, target_rank, est) — est in natural
    *         units, rounded to 6dp
    */
  def quantiles(df: DataFrame, groupCol: String, units: Column,
      binWidth: Long, perUnit: Long,
      qs: Seq[(String, Int, Int)]): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val hist = df
      .select(col(groupCol).as("g"), units.cast("long").as("u"))
      .select(col("g"), expr(floorDivSql("u", binWidth)).as("bin"))
      .groupBy("g", "bin")
      .agg(count(lit(1)).as("cnt"))
    quantilesOfHist(hist, groupCol, binWidth, perUnit, qs)
  }

  /** Quantile pick over an ALREADY-BUILT `(g, bin, cnt)` histogram —
    * shared by the batch path above and by streaming sketches that
    * maintain the per-(group, bin) counts in complete mode (count
    * merge is micro-batch-cut invariant, so the drained stream's
    * histogram IS the batch histogram). */
  def quantilesOfHist(hist: DataFrame, groupCol: String,
      binWidth: Long, perUnit: Long,
      qs: Seq[(String, Int, Int)]): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    require(perUnit > 0, s"perUnit must be positive, got $perUnit")
    require(qs.nonEmpty && qs.forall { case (_, n, dn) =>
      n > 0 && dn >= n }, s"quantiles must satisfy 0 < num <= den: $qs")
    val spark = hist.sparkSession
    import spark.implicits._

    // Both windows share the (g) partitioning → a single exchange of the
    // ALREADY-AGGREGATED bin table (≤ nBins rows per group), never the
    // fact rows.
    val wCum = Window.partitionBy("g").orderBy("bin")
    val wAll = Window.partitionBy("g")
    val cum = hist.select(col("g"), col("bin"), col("cnt"),
      sum(col("cnt")).over(wCum).as("cum"),
      sum(col("cnt")).over(wAll).as("n"))

    // Quantile list is a literal broadcast — the pick predicate selects
    // exactly one bin row per (group, quantile): the first bin whose
    // cumulative count reaches the target rank ceil(q·n).
    val qdf = qs.toDF("q_label", "qn", "qd")
    cum.crossJoin(broadcast(qdf))
      .withColumn("target", expr("(n * qn + qd - 1) DIV qd"))
      .filter(col("cum") >= col("target") &&
        col("cum") - col("cnt") < col("target"))
      .select(col("g").as(groupCol), col("q_label"),
        col("target").cast("long").as("target_rank"),
        round((
          (col("bin") * binWidth).cast("double")
            + lit(binWidth.toDouble)
            * ((col("target") - (col("cum") - col("cnt"))).cast("double")
              / col("cnt").cast("double"))
          ) / lit(perUnit.toDouble), 6).as("est"))
  }
}
