package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {

  test("bucketized proximity join equals the naive inequality join") {
    import spark.implicits._
    val ev = Seq(
      (1L, 7L, "2024-01-01 10:00:00"),
      (2L, 7L, "2024-01-01 10:20:00"), // 20min from 1 → pair at 30min tol
      (3L, 7L, "2024-01-01 11:30:00"), // 70min from 2 → no pair
      (4L, 8L, "2024-01-01 10:10:00"), // other user: never pairs with 7
      (5L, 7L, "2024-01-01 10:50:00")) // 30min from 2 exactly → inclusive
      .toDF("event_id", "user_id", "ts")
      .withColumn("ts", to_timestamp(col("ts")))
    val got = RangeJoin
      .timeProximityPairs(ev, "event_id", "user_id", "ts", 1800L)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = ev.as("a").join(ev.as("b"),
      col("a.user_id") === col("b.user_id") &&
        col("a.event_id") < col("b.event_id") &&
        abs(unix_micros(col("a.ts")) - unix_micros(col("b.ts")))
          <= 1800L * 1000000L)
      .select(col("a.event_id"), col("b.event_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === naive)
    assert(got === Set((1L, 2L), (2L, 5L)))
  }

  test("bucketized join equals naive join on the real events table") {
    val ev = graft.Tables.events(spark, sf())
    val got = RangeJoin
      .timeProximityPairs(ev, "event_id", "user_id", "ts", 1800L)
      .select("id_a", "id_b")
    val naive = ev.as("a").join(ev.as("b"),
      col("a.user_id") === col("b.user_id") &&
        col("a.event_id") < col("b.event_id") &&
        abs(unix_micros(col("a.ts")) - unix_micros(col("b.ts")))
          <= 1800L * 1000000L)
      .select(col("a.event_id").as("id_a"), col("b.event_id").as("id_b"))
    assert(got.exceptAll(naive).count() === 0)
    assert(naive.exceptAll(got).count() === 0)
  }
}
