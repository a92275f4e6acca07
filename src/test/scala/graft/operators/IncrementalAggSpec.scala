package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The state-merge algebra: any batch split and any merge order must
  * render identically to the one-shot aggregate, and a later increment
  * must compose onto an already-merged state. */
class IncrementalAggSpec extends SparkSpec {

  private def rendered(df: DataFrame): Map[String, (Long, Double, Double)] =
    df.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap

  test("split+merge renders identically to the one-shot aggregate") {
    val o = graft.Tables.orders(spark, sf())
    val oneShot = rendered(IncrementalAgg.render(
      IncrementalAgg.aggState(o, "o_orderpriority", "o_totalprice")))
    val k = col("o_orderkey")
    val parts = Seq(o.filter(k % 3 === 0), o.filter(k % 3 === 2),
      o.filter(k % 3 === 1))
      .map(b => IncrementalAgg.aggState(b, "o_orderpriority", "o_totalprice"))
    assert(rendered(IncrementalAgg.render(
      IncrementalAgg.mergeStates(parts))) === oneShot)
  }

  test("increments compose: state + delta + delta == full state") {
    val o = graft.Tables.orders(spark, sf())
    val k = col("o_orderkey")
    val s0 = IncrementalAgg.aggState(o.filter(k % 4 < 2),
      "o_orderpriority", "o_totalprice")
    val d1 = IncrementalAgg.aggState(o.filter(k % 4 === 2),
      "o_orderpriority", "o_totalprice")
    val s1 = IncrementalAgg.mergeStates(Seq(s0, d1))
    val d2 = IncrementalAgg.aggState(o.filter(k % 4 === 3),
      "o_orderpriority", "o_totalprice")
    val got = rendered(IncrementalAgg.render(
      IncrementalAgg.mergeStates(Seq(s1, d2))))
    val want = rendered(IncrementalAgg.render(
      IncrementalAgg.aggState(o, "o_orderpriority", "o_totalprice")))
    assert(got === want)
  }
}
