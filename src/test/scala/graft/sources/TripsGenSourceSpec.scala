package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Custom DataSource V2: planning (slices), determinism, column
  * pruning, and generator arithmetic. */
class TripsGenSourceSpec extends SparkSpec {

  private def load(rows: Long, slices: Int) =
    spark.read.format("graft.sources.TripsGenProvider")
      .option("rows", rows).option("slices", slices).load()

  test("row count, schema, and per-slice partition planning") {
    val df = load(1000, 5)
    assert(df.count() === 1000L)
    assert(df.schema === TripsGenSource.schema)
    assert(df.rdd.getNumPartitions === 5)
  }

  test("rows are deterministic and match the generator arithmetic") {
    val r = load(10, 2).orderBy("trip_id").collect()
    assert(r.map(_.getAs[Long]("trip_id")).toSeq === (0L until 10L))
    assert(r.map(_.getAs[String]("cab_type")).toSeq ===
      (0 until 10).map(i => TripsGenSource.cabTypes(i % 3)))
    assert(r.map(_.getAs[Long]("fare_cents")).toSeq ===
      (0L until 10L).map(i => 250L + (i * 131) % 4750L))
    // second read is identical (no hidden state)
    assert(load(10, 3).orderBy("trip_id").collect()
      .map(_.getAs[Long]("fare_cents")).toSeq ===
      r.map(_.getAs[Long]("fare_cents")).toSeq)
  }

  test("column pruning reaches the scan") {
    val pruned = load(100, 2).select("cab_type", "fare_cents")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("BatchScan"))
    assert(!scan.contains("pickup_ts") && !scan.contains("trip_id"))
  }

  test("timestamps land on the expected epoch-micro arithmetic") {
    val ts = load(3, 1).orderBy("trip_id")
      .select(unix_micros(col("pickup_ts")).as("us"))
      .collect().map(_.getLong(0)).toSeq
    assert(ts === (0L until 3L).map(i =>
      TripsGenSource.baseMicros + ((i * 977) % 31536000L) * 1000000L))
  }

  test("uneven division still covers every row exactly once") {
    val df = load(1003, 4)
    assert(df.count() === 1003L)
    assert(df.select("trip_id").distinct().count() === 1003L)
  }
}
