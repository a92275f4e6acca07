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

  test("null-safe join matches the NULLed (pending) orders to 'unknown'") {
    val got = RelationalQueries.q30NullSafeJoin(spark, sf())
      .collect().map(r => r.getString(0) -> r.getAs[Long]("cnt")).toMap
    val pending = graft.Tables.orders(spark, sf())
      .filter(col("o_orderstatus") === "P").count()
    assert(got("unknown") === pending)
    assert(got.values.sum === graft.Tables.orders(spark, sf()).count())
  }

  test("ntile quartiles are balanced within one row per partition") {
    val sizes = RelationalQueries.q33RankFuncs(spark, sf())
      .groupBy("prio", "quartile").count()
      .groupBy("prio").agg((max("count") - min("count")).as("spread"))
      .collect()
    assert(sizes.forall(_.getAs[Long]("spread") <= 1L))
  }

  test("approx distinct within 5% of exact per group") {
    val bad = RelationalQueries.q20ApproxDistinct(spark, sf())
      .filter(abs(col("approx_parts") - col("exact_parts")) >
        col("exact_parts") * 0.05)
    assert(bad.count() === 0)
  }
}
