package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** End-to-end checks on the taxi-schema pipeline (CSV → staging →
  * transform → MergeTree-analogue → queries). */
class TaxiPipelineSpec extends SparkSpec {

  test("chain preserves row count and yields a non-null analytic table") {
    val n = Tables.lineitem(spark, sf()).count()
    val trips = graft.etl.MergeTreeWriter.read(
      spark, TaxiPipelineQueries.prepare(spark, sf()))
    assert(trips.count() === n)
    // the CTAS transform eliminates every analytic NULL
    val nullable = Seq("passenger_count", "trip_distance", "total_amount",
      "dropoff_datetime", "store_and_fwd_flag", "payment_type_", "cab_type")
    nullable.foreach { c =>
      assert(trips.filter(col(c).isNull).count() === 0, s"$c has NULLs")
    }
  }

  test("analytic table is month-partitioned (partition pruning works)") {
    val root = TaxiPipelineQueries.prepare(spark, sf())
    assert(new java.io.File(root).listFiles()
      .exists(_.getName.startsWith("pickup_month=")))
    // a month filter must prune partitions at the scan
    val trips = graft.etl.MergeTreeWriter.read(spark, root)
    val oneMonth = trips.filter(col("pickup_month") === "1995-06")
    val scan = oneMonth.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(pickup_month"),
      s"month filter not pushed to partition pruning:\n$scan")
  }

  test("q1 cab_type counts match the derivation computed directly") {
    val got = TaxiPipelineQueries.q1(spark, sf())
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = Tables.lineitem(spark, sf())
      .groupBy(when(pmod(col("l_orderkey"), lit(3L)) === 0, "yellow")
        .when(pmod(col("l_orderkey"), lit(3L)) === 1, "green")
        .otherwise("uber").as("cab_type"))
      .count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === want)
    assert(got.keySet === Set("yellow", "green", "uber"))
  }

  test("all five canonical payment codes appear, incl. UNK from the " +
      "out-of-domain spelling") {
    val pays = TaxiPipelineQueries.canon(spark, sf())
      .collect().map(_.getString(0)).toSet
    assert(pays === Set("CSH", "CRE", "NOC", "DIS", "UNK"))
  }
}
