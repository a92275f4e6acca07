package graft.etl

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Unit coverage for the taxi ETL surface (SURVEY.md §5): `\N` CSV null
  * semantics, the CTAS expression table (payment canon, defaults,
  * padding, enum validation), the broadcast dim joins, and the
  * month-partitioned sorted writer.
  */
class TripsEtlSpec extends SparkSpec {

  private def tmpDir(name: String): String =
    Files.createTempDirectory(name).toString

  // A 51-column raw CSV line: only the fields under test are non-empty.
  private def rawLine(trip_id: Long, vendor: String, pickupTs: String,
      dropoffTs: String, sfFlag: String, passengers: String,
      distance: String, payment: String, cab: String): String = {
    val cols = Array.fill(51)("")
    cols(0) = trip_id.toString; cols(1) = vendor; cols(2) = pickupTs
    cols(3) = dropoffTs; cols(4) = sfFlag; cols(10) = passengers
    cols(11) = distance; cols(20) = payment; cols(24) = cab
    cols.mkString(",")
  }

  private lazy val rawCsvDir: String = {
    val dir = tmpDir("trips_raw")
    val lines = Seq(
      rawLine(1, "CMT", "2015-01-05 10:00:00", "2015-01-05 10:20:00",
        "Y", "2", "1.5", "CASH", "yellow"),
      rawLine(2, "VTS", "2015-02-06 11:00:00", "", "N", "1", "2.5",
        "Credit", "green"),
      // all-optional-empty row: exercises every `\N`/empty→null default
      rawLine(3, "2", "2015-02-07 12:00:00", "", "", "", "", "", ""),
      rawLine(4, "B02512", "2016-03-08 13:00:00", "2016-03-08 13:30:00",
        "1", "3", "0.5", "4", "uber"))
    Files.write(java.nio.file.Paths.get(dir, "trips_x1.csv"),
      lines.mkString("\n").getBytes)
    dir
  }

  test("S1/S2: raw CSV read maps empty and \\N fields to null") {
    val df = RawCsvSource.read(spark, rawCsvDir)
    assert(df.count() === 4)
    val r3 = df.filter(col("trip_id") === 3).head()
    assert(r3.getAs[Any]("dropoff_datetime") == null)
    assert(r3.getAs[Any]("passenger_count") == null)
    assert(r3.getAs[Any]("cab_type") == null)
    val r1 = df.filter(col("trip_id") === 1).head()
    assert(r1.getAs[Short]("passenger_count") === 2)
  }

  test("payment_type canonicalization covers all 21 reference spellings") {
    import spark.implicits._
    val spellings = TripsSchemas.paymentCanon.flatMap { case (canon, ss) =>
      ss.map(_ -> canon)
    }.toSeq ++ Seq("garbage" -> "UNK", "5" -> "UNK")
    val got = spellings.map(_._1).toDF("payment_type")
      .select(TripsTransform.canonPaymentType(col("payment_type")).as("c"))
      .as[String].collect()
    assert(got.toSeq === spellings.map(_._2))
  }

  test("transform materializes null defaults (0 / '' / epoch-0)") {
    val t = TripsTransform(RawCsvSource.read(spark, rawCsvDir))
    val r3 = t.filter(col("trip_id") === 3).head()
    assert(r3.getAs[java.sql.Timestamp]("dropoff_datetime").getTime === 0L)
    assert(r3.getAs[java.sql.Date]("dropoff_date").toString === "1970-01-01")
    assert(r3.getAs[Short]("passenger_count") === 0)
    assert(r3.getAs[Float]("total_amount") === 0.0f)
    assert(r3.getAs[String]("pickup_boroname") === "")
    assert(r3.getAs[Byte]("store_and_fwd_flag") === 0)
    assert(r3.getAs[String]("cab_type") === "yellow") // null → default
    assert(r3.getAs[String]("payment_type_") === "UNK")
  }

  test("store_and_fwd_flag IN ('Y','1','2') stored as 0/1") {
    val t = TripsTransform(RawCsvSource.read(spark, rawCsvDir))
    val flags = t.select("trip_id", "store_and_fwd_flag").collect()
      .map(r => r.getLong(0) -> r.getByte(1)).toMap
    assert(flags === Map(1L -> 1, 2L -> 0, 3L -> 0, 4L -> 1))
  }

  test("enum cast throws on out-of-domain vendor (strict CH semantics)") {
    import spark.implicits._
    val bad = Seq("NOT_A_VENDOR").toDF("vendor_id")
    val ex = intercept[Exception] {
      bad.select(TripsTransform.enumCast(col("vendor_id"),
        TripsSchemas.vendorIds, "vendor_id")).collect()
    }
    assert(ex.getMessage.contains("invalid vendor_id"))
  }

  test("J1-J4: broadcast left joins, dim joined twice, unmatched → null") {
    import spark.implicits._
    val trips = Seq(
      (1L, 1L, "2015-01-05 10:00:00", 10L, 200L),
      (2L, 2L, "2015-01-06 11:00:00", 999L, 10L),
      (3L, 3L, "2015-01-07 12:00:00", 20L, 20L))
      .toDF("trip_id", "cab_type_id", "pickup_datetime",
        "pickup_nyct2010_gid", "dropoff_nyct2010_gid")
      .withColumn("pickup_datetime",
        to_timestamp(col("pickup_datetime")))
    val cabs = Seq((1L, "yellow"), (2L, "green"), (3L, "uber"))
      .toDF("id", "type")
    val weather = Seq(("2015-01-05", 0.5f), ("2015-01-06", 0.0f))
      .toDF("date", "precipitation")
      .withColumn("date", to_date(col("date")))
    // gid 200 > 127: pins the fix of the reference's Int8-gid overflow
    val nyct = Seq((10L, "Manhattan"), (20L, "Queens"), (200L, "Bronx"))
      .toDF("gid", "boroname")

    val out = DimJoins.denormalize(trips, cabs, weather, nyct)
    val r2 = out.filter(col("trip_id") === 2).head()
    assert(r2.getAs[String]("cab_type") === "green")
    assert(r2.getAs[Any]("pickup_boroname") == null) // gid 999 unmatched
    assert(r2.getAs[String]("dropoff_boroname") === "Manhattan")
    val r1 = out.filter(col("trip_id") === 1).head()
    assert(r1.getAs[Float]("precipitation") === 0.5f)
    assert(r1.getAs[String]("pickup_boroname") === "Manhattan")
    assert(r1.getAs[String]("dropoff_boroname") === "Bronx")
    val r3 = out.filter(col("trip_id") === 3).head()
    assert(r3.getAs[Any]("precipitation") == null) // date unmatched
  }

  test("corrupt rows are captured, clean rows parse, nothing is lost") {
    val dir = tmpDir("trips_corrupt")
    val lines = Seq(
      rawLine(7, "CMT", "2015-01-05 10:00:00", "2015-01-05 10:20:00",
        "Y", "2", "1.5", "CASH", "yellow"),
      "garbage-trip-id,CMT,not-a-timestamp,,,,,,,,,,,,,,,,,,,,,,,,,,,,,,,,,,,,,,,,,,,,,,,,",
      rawLine(8, "VTS", "2015-01-06 10:00:00", "", "N", "1", "2.0",
        "CRD", "green"))
    Files.write(java.nio.file.Paths.get(dir, "mixed.csv"),
      lines.mkString("\n").getBytes("UTF-8"))
    val out = RawCsvSource.readCaptureCorrupt(spark, dir).cache()
    assert(out.count() === 3) // every input line accounted for
    val bad = out.filter(col("_corrupt_record").isNotNull)
    assert(bad.count() === 1)
    assert(bad.head().getAs[String]("_corrupt_record")
      .startsWith("garbage-trip-id"))
    val good = out.filter(col("_corrupt_record").isNull)
    assert(good.count() === 2)
    assert(good.select("trip_id").collect().map(_.getLong(0)).toSet
      === Set(7L, 8L))
    out.unpersist()
  }

  test("S4: month-partitioned sorted write round-trips and sorts") {
    val t = TripsTransform(RawCsvSource.read(spark, rawCsvDir))
    val out = tmpDir("mergetree_out")
    MergeTreeWriter.write(t, out)
    val back = MergeTreeWriter.read(spark, out)
    assert(back.count() === 4)
    assert(back.select("pickup_month").distinct().count() === 3)
    // within-file ordering by pickup_datetime (sortWithinPartitions)
    val feb = back.filter(col("pickup_month") === "2015-02")
      .select("pickup_datetime").collect().map(_.getTimestamp(0).getTime)
    assert(feb.toSeq === feb.sorted.toSeq)
  }

  test("S5→S1: gzip CSV export reads back identically") {
    val t = TripsTransform(RawCsvSource.read(spark, rawCsvDir))
      .select("trip_id", "vendor_id", "passenger_count", "total_amount")
    val out = tmpDir("csv_export")
    CsvExport.write(t, out, shards = 2)
    assert(new java.io.File(out).listFiles()
      .exists(_.getName.endsWith(".csv.gz")))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("trip_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("vendor_id",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("passenger_count",
        org.apache.spark.sql.types.ShortType),
      org.apache.spark.sql.types.StructField("total_amount",
        org.apache.spark.sql.types.FloatType)))
    val back = RawCsvSource.read(spark, out, schema)
    assert(back.count() === 4)
    assert(back.agg(sum("passenger_count")).head().getLong(0) === 6L)
  }
}
