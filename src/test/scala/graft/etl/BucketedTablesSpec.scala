package graft.etl

import graft.{SparkSpec, Tables}
import graft.queries.EtlQueries
import org.apache.spark.sql.functions._

/** Bucketed co-located join: correctness vs the plain parquet join, and
  * the plan property that justifies the layout — ZERO exchanges (and no
  * per-side sort) in a fact⋈fact sort-merge join. */
class BucketedTablesSpec extends SparkSpec {

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.queryExecution.toRdd.foreach(_ => ())
    df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.toString
      case other => other.toString
    }
  }

  test("bucketed join matches the plain join bit-for-bit") {
    val got = EtlQueries.bucketedJoin(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val want = Tables.lineitem(spark, sf())
      .join(Tables.orders(spark, sf()),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("n_items"),
        round(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(38,8)")).cast("double"), 2).as("revenue"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("co-located join plan has no exchange and no per-side sort") {
    val (li, ord) = EtlQueries.prepareBucketed(spark, sf())
    val joined = BucketedTables.cogroupJoin(spark, li, ord,
      "l_orderkey", "o_orderkey")
    val plan = finalPlan(joined)
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    assert(!plan.contains("Exchange"),
      s"bucketed join must not shuffle either side:\n$plan")
    // one file per bucket + sortBy(key) → the SMJ consumes the bucket
    // files pre-sorted; a Sort node would mean the layout wasn't used
    assert(!plan.contains("Sort "), s"bucket sort order not used:\n$plan")
    // both scans report the bucket layout
    assert(plan.contains("Bucketed: true"), s"scan not bucketed:\n$plan")
  }

  test("aggregation on the bucket key reuses the clustering (no shuffle)") {
    val (li, _) = EtlQueries.prepareBucketed(spark, sf())
    val agg = spark.table(li).groupBy("l_orderkey")
      .agg(sum("l_quantity").as("q"))
    val plan = finalPlan(agg)
    assert(!plan.contains("Exchange"),
      s"groupBy(bucket key) must be exchange-free:\n$plan")
  }
}
