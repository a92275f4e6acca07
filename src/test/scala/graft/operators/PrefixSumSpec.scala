package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Range-partitioned running totals ([[PrefixSum]]): the scale-safe
  * replacement for `sum(v).over(Window.orderBy(k))` (a single-task
  * funnel). */
class PrefixSumSpec extends SparkSpec {

  import spark.implicits._

  test("exclusive prefix sums equal the naive global window on a " +
      "shuffled frame") {
    val rnd = new scala.util.Random(3)
    val rows = rnd.shuffle((0 until 1000).toList)
      .map(k => (k.toLong * 7 + 1, (k % 13).toLong + 1))
    val df = rows.toDF("k", "v").repartition(8)
    val (out, release) = PrefixSum.withRunningTotalPinned(df,
      Seq(col("k").asc), col("v"), nRanges = 9, out = "cum")
    val got = out.select("k", "cum").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    var acc = 0L
    val want = rows.sortBy(_._1).map { case (k, v) =>
      val r = k -> acc; acc += v; r
    }.toMap
    assert(got === want)
    release()
  }

  test("descending order and the broadcast-offsets branch stay exact") {
    val rows = (0 until 300).map(k => (k.toLong, 2L))
    val df = rows.toDF("k", "v")
    val out = PrefixSum.withRunningTotal(df, Seq(col("k").desc),
      col("v"), nRanges = 100, out = "cum")
    val got = out.select("k", "cum").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // descending: rows before k are those with larger k
    val want = rows.map { case (k, _) => k -> (299L - k) * 2L }.toMap
    assert(got === want)
  }

  test("no single-partition exchange in the plan (the naive window " +
      "has one); the only windows are partitioned by the range id") {
    val df = (0 until 500).map(k => (k.toLong, 1L)).toDF("k", "v")
    val (out, release) = PrefixSum.withRunningTotalPinned(df,
      Seq(col("k").asc), col("v"), nRanges = 5, out = "cum")
    out.count()
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("SinglePartition"))
    assert(p.contains("Window") && p.contains("[__pid"))
    release()
    val naive = df.withColumn("cum", coalesce(sum(col("v")).over(
      Window.orderBy("k").rowsBetween(Window.unboundedPreceding, -1)),
      lit(0L)))
    naive.count()
    assert(naive.queryExecution.executedPlan.toString
      .contains("SinglePartition"))
  }
}
