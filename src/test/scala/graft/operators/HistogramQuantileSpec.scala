package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HistogramQuantileSpec extends SparkSpec {
  import spark.implicits._

  test("hand fixture: rank pick and within-bin interpolation") {
    // group x: values 0..99 cents, bin width 10 → bins 0..9, 10 each.
    val df = (0L until 100L).map(c => ("x", c)).toDF("g", "c")
    val out = HistogramQuantile.quantiles(df, "g", col("c"),
      binWidth = 10L, perUnit = 1L,
      qs = Seq(("p50", 1, 2), ("p90", 9, 10))).collect()
      .map(r => r.getString(1) -> (r.getLong(2), r.getDouble(3))).toMap
    // p50: target = ceil(100/2) = 50 → bin 4 (cum 50), prevCum 40 →
    // est = 40 + 10 * (50-40)/10 = 50
    assert(out("p50") === (50L, 50.0))
    // p90: target = 90 → bin 8 (cum 90), prevCum 80 → 80 + 10*10/10 = 90
    assert(out("p90") === (90L, 90.0))
  }

  test("negative units bin by floor division (ANSI `//` semantics)") {
    // values -50..49, width 10 → bins -5..4 with 10 values each; trunc
    // division would dump -9..-1 into bin 0 on the Spark side only and
    // silently diverge from the DuckDB replay
    val df = (-50L until 50L).map(c => ("n", c)).toDF("g", "c")
    val out = HistogramQuantile.quantiles(df, "g", col("c"),
      binWidth = 10L, perUnit = 1L,
      qs = Seq(("p25", 1, 4), ("p50", 1, 2))).collect()
      .map(r => r.getString(1) -> (r.getLong(2), r.getDouble(3))).toMap
    // p25: target 25 → bin -3 (cum 30, prevCum 20) → -30 + 10*5/10 = -25
    assert(out("p25") === (25L, -25.0))
    // p50: target 50 → bin -1 (cum 50, prevCum 40) → -10 + 10*10/10 = 0
    assert(out("p50") === (50L, 0.0))
  }

  test("single-bin group interpolates inside the only bin") {
    val df = Seq(("y", 5L), ("y", 6L), ("y", 7L), ("y", 8L))
      .toDF("g", "c")
    val out = HistogramQuantile.quantiles(df, "g", col("c"),
      binWidth = 100L, perUnit = 1L, qs = Seq(("p50", 1, 2))).collect()
    assert(out.length === 1)
    // all 4 in bin 0: target = 2 → est = 0 + 100 * 2/4 = 50
    assert(out.head.getDouble(3) === 50.0)
  }

  test("estimate within one bin width of the exact percentile") {
    val li = graft.Tables.lineitem(spark, sf())
    val est = HistogramQuantile.quantiles(li, "l_returnflag",
      round(col("l_extendedprice") * 100), binWidth = 50000L,
      perUnit = 100L, qs = Seq(("p50", 1, 2), ("p95", 19, 20)))
      .collect().map(r =>
        (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    val exact = li.groupBy("l_returnflag").agg(
      expr("percentile(l_extendedprice, 0.5)").as("p50"),
      expr("percentile(l_extendedprice, 0.95)").as("p95"))
      .collect().flatMap(r => Seq(
        (r.getString(0), "p50") -> r.getDouble(1),
        (r.getString(0), "p95") -> r.getDouble(2))).toMap
    // bin width $500 bounds the rank-to-value error
    exact.foreach { case (k, v) =>
      assert(math.abs(est(k) - v) <= 500.0, s"$k est=${est(k)} exact=$v")
    }
  }

  test("deterministic under repartition (layout independence)") {
    val li = graft.Tables.lineitem(spark, sf())
    def run(df: org.apache.spark.sql.DataFrame) =
      HistogramQuantile.quantiles(df, "l_returnflag",
        round(col("l_extendedprice") * 100), 50000L, 100L,
        Seq(("p25", 1, 4), ("p50", 1, 2)))
        .collect().map(_.toSeq).toSet
    assert(run(li) === run(li.repartition(13)))
  }

  test("invalid parameters rejected") {
    val df = Seq(("x", 1L)).toDF("g", "c")
    intercept[IllegalArgumentException] {
      HistogramQuantile.quantiles(df, "g", col("c"), 0L, 1L,
        Seq(("p50", 1, 2)))
    }
    intercept[IllegalArgumentException] {
      HistogramQuantile.quantiles(df, "g", col("c"), 10L, 1L,
        Seq(("bad", 3, 2)))
    }
  }
}
