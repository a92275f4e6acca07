package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {

  test("leftAsOf picks the latest right row at or before each left time") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, "2020-01-05"), // between r1 and r2 → r1
      (2L, 10L, "2020-01-10"), // exactly at r2 → r2 (inclusive)
      (3L, 10L, "2020-03-01"), // after all → r2
      (4L, 10L, "2019-12-31"), // before all → null
      (5L, 99L, "2020-01-05")) // unmatched key → null
      .toDF("event_id", "k", "t")
      .withColumn("t", to_timestamp(col("t")))
    val right = Seq(
      (10L, "2020-01-01", "r1"),
      (10L, "2020-01-10", "r2"))
      .toDF("rk", "rt", "v")
      .withColumn("rt", to_timestamp(col("rt")))
    val out = AsOfJoin.leftAsOf(left, right, "k", "rk", "t", "rt", Seq("v"))
      .collect().map(r => r.getAs[Long]("event_id") -> r.getAs[String]("v"))
      .toMap
    assert(out === Map(1L -> "r1", 2L -> "r2", 3L -> "r2",
      4L -> null, 5L -> null))
  }

  test("forward direction picks the earliest right row at or after") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, "2020-01-05"), // between r1 and r2 → r2 (next ahead)
      (2L, 10L, "2020-01-10"), // exactly at r2 → r2 (inclusive)
      (3L, 10L, "2020-03-01"), // after all → null
      (4L, 10L, "2019-12-31")) // before all → r1
      .toDF("event_id", "k", "t")
      .withColumn("t", to_timestamp(col("t")))
    val right = Seq(
      (10L, "2020-01-01", "r1"),
      (10L, "2020-01-10", "r2"))
      .toDF("rk", "rt", "v")
      .withColumn("rt", to_timestamp(col("rt")))
    val out = AsOfJoin.leftAsOf(left, right, "k", "rk", "t", "rt",
      Seq("v"), direction = "forward")
      .collect().map(r => r.getAs[Long]("event_id") -> r.getAs[String]("v"))
      .toMap
    assert(out === Map(1L -> "r2", 2L -> "r2", 3L -> null, 4L -> "r1"))
  }

  test("tolerance nulls out matches farther than the window") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, "2020-01-02"), // 1 day after r1 → within 2-day tol
      (2L, 10L, "2020-01-08")) // 7 days after r1 → outside tol
      .toDF("event_id", "k", "t")
      .withColumn("t", to_timestamp(col("t")))
    val right = Seq((10L, "2020-01-01", "r1"))
      .toDF("rk", "rt", "v")
      .withColumn("rt", to_timestamp(col("rt")))
    val twoDaysUs = 2L * 24 * 3600 * 1000000
    val out = AsOfJoin.leftAsOf(left, right, "k", "rk", "t", "rt",
      Seq("v"), toleranceMicros = Some(twoDaysUs))
      .collect().map(r => r.getAs[Long]("event_id") -> r.getAs[String]("v"))
      .toMap
    assert(out === Map(1L -> "r1", 2L -> null))
  }

  test("string join keys keep their native type (no silent null-cast)") {
    import spark.implicits._
    val left = Seq((1L, "u10", "2020-01-05"), (2L, "u99", "2020-01-05"))
      .toDF("event_id", "k", "t")
      .withColumn("t", to_timestamp(col("t")))
    val right = Seq(("u10", "2020-01-01", "r1"), ("u11", "2020-01-01", "x"))
      .toDF("rk", "rt", "v")
      .withColumn("rt", to_timestamp(col("rt")))
    val out = AsOfJoin.leftAsOf(left, right, "k", "rk", "t", "rt", Seq("v"))
      .collect().map(r => r.getAs[Long]("event_id") -> r.getAs[String]("v"))
      .toMap
    assert(out === Map(1L -> "r1", 2L -> null))
  }

  test("incompatible key types fail fast instead of null-matching") {
    import spark.implicits._
    val left = Seq((1L, "u10", "2020-01-05")).toDF("event_id", "k", "t")
      .withColumn("t", to_timestamp(col("t")))
    val right = Seq((10L, "2020-01-01", "r1")).toDF("rk", "rt", "v")
      .withColumn("rt", to_timestamp(col("rt")))
    intercept[IllegalArgumentException] {
      AsOfJoin.leftAsOf(left, right, "k", "rk", "t", "rt", Seq("v"))
    }
  }

  test("caller columns that look like internal names don't collide") {
    import spark.implicits._
    val left = Seq((1L, 10L, "2020-01-05", "keepme"))
      .toDF("event_id", "_gk", "t", "_gt") // worst case: _g-prefixed cols
      .withColumn("t", to_timestamp(col("t")))
      .withColumnRenamed("_gk", "k")
    val right = Seq((10L, "2020-01-01", "r1")).toDF("rk", "rt", "_gside")
      .withColumn("rt", to_timestamp(col("rt")))
    val out = AsOfJoin.leftAsOf(left, right, "k", "rk", "t", "rt",
      Seq("_gside"))
    assert(out.columns.toSeq === Seq("event_id", "k", "t", "_gt", "_gside"))
    val row = out.collect().head
    assert(row.getAs[String]("_gt") === "keepme")
    assert(row.getAs[String]("_gside") === "r1")
  }

  test("null-time right rows never match; null-time left rows get null") {
    import spark.implicits._
    val left = Seq((1L, Some("2020-01-05")), (2L, None))
      .toDF("event_id", "t")
      .withColumn("t", to_timestamp(col("t")))
      .withColumn("k", lit(10L))
    val right = Seq((10L, Some("2020-06-01"), "future"),
      (10L, None, "nulltime"))
      .toDF("rk", "rt", "v")
      .withColumn("rt", to_timestamp(col("rt")))
    val out = AsOfJoin.leftAsOf(left, right, "k", "rk", "t", "rt", Seq("v"))
      .collect().map(r => r.getAs[Long]("event_id") -> r.getAs[String]("v"))
      .toMap
    // no right row at/before 2020-01-05 (the null-time row must NOT
    // leak in), and the null-time left row matches nothing
    assert(out === Map(1L -> null, 2L -> null))
  }

  test("row count preserved (left join semantics)") {
    val out = graft.queries.EventQueries.eventsAsOfOrders(spark, sf())
    assert(out.count() === graft.Tables.events(spark, sf()).count())
  }
}
