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

  test("pairs survive when the smaller id is LATER in time (ids not " +
      "time-ordered, adjacent buckets)") {
    import spark.implicits._
    // tol = 60s → buckets are minute-wide. id 1 sits at 10:01:10
    // (bucket b), id 2 at 10:00:50 (bucket b−1): within 20s of each
    // other, adjacent buckets, and the smaller id is the LATER event.
    // A {b, b+1}-only probe finds this in neither orientation.
    val ev = Seq(
      (1L, 7L, "2024-01-01 10:01:10"),
      (2L, 7L, "2024-01-01 10:00:50"),
      (3L, 7L, "2024-01-01 10:03:30"), // isolated → no pair
      (4L, 8L, "2024-01-01 10:01:05"), // other key
      (5L, 8L, "2024-01-01 10:00:55")) // pairs with 4, reversed order too
      .toDF("event_id", "user_id", "ts")
      .withColumn("ts", to_timestamp(col("ts")))
    val got = RangeJoin
      .timeProximityPairs(ev, "event_id", "user_id", "ts", 60L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // dt_us is negative: the larger id is the earlier event
    assert(got === Set((1L, 2L, -20000000L), (4L, 5L, -10000000L)))
  }

  test("bucketized join equals naive join on shuffled-id random data") {
    import spark.implicits._
    // ids assigned by a hash, NOT by time — the adversarial layout the
    // driver testdata doesn't exercise (its event_ids are time-ordered).
    val rnd = new scala.util.Random(42)
    val rows = (1 to 400).map { i =>
      val key = rnd.nextInt(5).toLong
      val tsUs = 1700000000000000L + rnd.nextInt(7200) * 1000000L
      ((i * 2654435761L) % 100003L, key, tsUs)
    }
    val ev = rows.toDF("event_id", "user_id", "us")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
    val got = RangeJoin
      .timeProximityPairs(ev, "event_id", "user_id", "ts", 300L)
      .select("id_a", "id_b")
    val naive = ev.as("a").join(ev.as("b"),
      col("a.user_id") === col("b.user_id") &&
        col("a.event_id") < col("b.event_id") &&
        abs(unix_micros(col("a.ts")) - unix_micros(col("b.ts")))
          <= 300L * 1000000L)
      .select(col("a.event_id").as("id_a"), col("b.event_id").as("id_b"))
    assert(got.exceptAll(naive).count() === 0)
    assert(naive.exceptAll(got).count() === 0)
    assert(got.count() > 0)
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
