package graft.util

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CatalogSpec extends SparkSpec {

  test("registerAll lets pure SQL hit every table by name") {
    Catalog.registerAll(spark, sf())
    val n = spark.sql(
      "SELECT count(*) FROM lineitem JOIN orders ON l_orderkey = o_orderkey")
      .head().getLong(0)
    assert(n === 6000L)
  }

  test("tableCounts reports every table exactly once") {
    val counts = Catalog.tableCounts(spark, sf())
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet === graft.Tables.names.toSet)
    assert(counts("lineitem") === 6000L)
    assert(counts("region") === 5L)
  }

  test("reconcile computes the stage delta") {
    val li = graft.Tables.lineitem(spark, sf())
    val r = Catalog.reconcile(li, li.filter(col("l_quantity") > 1000.0))
      .head()
    assert(r.getAs[Long]("rows_before") === 6000L)
    assert(r.getAs[Long]("rows_after") === 0L)
    assert(r.getAs[Long]("delta") === -6000L)
  }
}
