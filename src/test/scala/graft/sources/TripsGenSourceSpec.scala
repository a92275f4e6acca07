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

  test("trip_id filters are absorbed into the range before planning") {
    val df = load(100000, 8)
      .filter(col("trip_id") >= 60000L && col("trip_id") < 60100L)
    val r = df.orderBy("trip_id").collect()
    assert(r.map(_.getAs[Long]("trip_id")).toSeq === (60000L until 60100L))
    // fully honored: no Filter node survives, and only the pruned
    // range is planned (one partition of 100 rows, not 8 of 12500)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Filter ("), plan.linesIterator.take(6).mkString("\n"))
    assert(plan.contains("range=[60000,60100)"))
    assert(df.rdd.getNumPartitions === 1)
  }

  test("equality, strict bounds, and contradictions absorb correctly") {
    val eq = load(1000, 4).filter(col("trip_id") === 42L)
    assert(eq.collect().map(_.getAs[Long]("trip_id")).toSeq === Seq(42L))
    val strict = load(1000, 4)
      .filter(col("trip_id") > 10L && col("trip_id") <= 13L)
    assert(strict.orderBy("trip_id").collect()
      .map(_.getAs[Long]("trip_id")).toSeq === Seq(11L, 12L, 13L))
    // contradictory range → zero partitions planned, zero rows
    val none = load(1000, 4)
      .filter(col("trip_id") > 500L && col("trip_id") < 100L)
    assert(none.count() === 0L)
    assert(none.rdd.getNumPartitions === 0)
  }

  test("non-trip_id predicates stay post-scan and still filter") {
    val df = load(300, 2).filter(col("cab_type") === "green")
    // green = indices ≡ 1 (mod 3)
    assert(df.count() === 100L)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("range=[0,300)"))
    // mixed: trip_id conjunct absorbed, cab_type evaluated post-scan
    val mixed = load(300, 2)
      .filter(col("trip_id") < 30L && col("cab_type") === "green")
    assert(mixed.orderBy("trip_id").collect()
      .map(_.getAs[Long]("trip_id")).toSeq ===
      (0L until 30L).filter(_ % 3 == 1))
  }

  test("reported statistics track the pruned range") {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val df = load(100000, 8).filter(col("trip_id") < 64L)
    val scan = df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan
    }.get
    val stats = scan.asInstanceOf[
      org.apache.spark.sql.connector.read.SupportsReportStatistics]
      .estimateStatistics()
    assert(stats.numRows().getAsLong === 64L)
    assert(stats.sizeInBytes().getAsLong === 64L * 40L)
  }
}
