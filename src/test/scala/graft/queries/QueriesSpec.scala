package graft.queries

import graft.{SparkSpec, SparkEntry}
import org.apache.spark.sql.functions._

/** Sanity over the driver-contract registry itself. */
class QueriesSpec extends SparkSpec {

  test("entry flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("q1 counts match a hand aggregation") {
    val got = RelationalQueries.q1CountByFlag(spark, sf())
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = graft.Tables.lineitem(spark, sf())
      .groupBy("l_returnflag").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === want)
  }

  test("approx distinct within 5% of exact per group") {
    val bad = RelationalQueries.q20ApproxDistinct(spark, sf())
      .filter(abs(col("approx_parts") - col("exact_parts")) >
        col("exact_parts") * 0.05)
    assert(bad.count() === 0)
  }
}
