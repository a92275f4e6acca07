package graft.queries

import graft.SparkSpec
import graft.operators.RuntimeFilters
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Runtime pruning lanes: dynamic partition pruning must actually
  * appear in the executed plan (not just return the right rows — the
  * whole point is WHICH files get read), and Bloom join pruning must be
  * row-invisible versus the unpruned join. */
class DppBloomSpec extends SparkSpec {

  private def executedPlanString(df: org.apache.spark.sql.DataFrame): String = {
    df.queryExecution.toRdd.foreach(_ => ())
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
  }

  test("dpp_join: dynamicpruning reaches the fact scan's PartitionFilters") {
    val df = EtlQueries.dppJoin(spark, sf())
    val plan = executedPlanString(df)
    assert(plan.contains("dynamicpruning"),
      s"expected a dynamic pruning subquery in:\n$plan")
  }

  test("dpp_join matches the direct month-filtered aggregate") {
    val got = EtlQueries.dppJoin(spark, sf())
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    val want = graft.Tables.lineitem(spark, sf())
      .withColumn("ship_month", date_format(col("l_shipdate"), "yyyy-MM"))
      .filter(col("ship_month").isin("1996-04", "1996-05", "1996-06"))
      .groupBy("ship_month")
      .agg(count(lit(1)).as("cnt"),
        round(sum(col("l_quantity").cast("decimal(38,8)"))
          .cast("double"), 2).as("sum_qty"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("bloomPrunedJoin is row-identical to the plain join") {
    import spark.implicits._
    val probe = (1L to 2000L).map(i => (i, s"p$i")).toDF("pk", "pv")
    // build side keeps every 7th key plus some keys absent from probe
    val build = ((7L to 2000L by 7) ++ Seq(90001L, 90002L))
      .map(k => (k, s"b$k")).toDF("bk", "bv")
    val pruned = RuntimeFilters.bloomPrunedJoin(probe, build, "pk", "bk")
      .select("pk", "pv", "bk", "bv").collect().toSet
    val plain = probe.join(build, col("pk") === col("bk"))
      .select("pk", "pv", "bk", "bv").collect().toSet
    assert(pruned === plain)
    assert(plain.size === (7L to 2000L by 7).size)
  }

  test("empty build side degrades to the (empty) join, not an analysis error") {
    import spark.implicits._
    val probe = (1L to 100L).map(i => (i, s"p$i")).toDF("pk", "pv")
    val empty = Seq.empty[(Long, String)].toDF("bk", "bv")
    // BloomFilterAggregate over zero rows yields a null blob; the join
    // must come back empty with the joined schema instead of failing
    // analysis on a NullType might_contain operand
    val out = RuntimeFilters.bloomPrunedJoin(probe, empty, "pk", "bk")
    assert(out.columns.toSeq === Seq("pk", "pv", "bk", "bv"))
    assert(out.count() === 0L)
    // all-null-keyed build side is the same degenerate case
    val nullKeys = Seq((Option.empty[Long], "x")).toDF("bk", "bv")
    assert(RuntimeFilters.bloomPrunedJoin(probe, nullKeys, "pk", "bk")
      .count() === 0L)
  }

  test("bloom pruning sits before the join in the probe plan") {
    val df = RelationalQueries.q42BloomJoin(spark, sf())
    val plan = executedPlanString(df)
    assert(plan.contains("might_contain"),
      s"expected might_contain in probe-side plan:\n$plan")
    assert(df.collect().nonEmpty)
  }
}
