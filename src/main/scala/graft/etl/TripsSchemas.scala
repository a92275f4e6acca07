package graft.etl

import org.apache.spark.sql.types._

/** Explicit schemas for the NYC-taxi pipeline (SURVEY.md §1.2-1.3,
  * FIXTURES.md §1-3). Schemas are always declared, never inferred — the
  * reference's DDLs enumerate every column
  * (/root/reference/README.md:448-506, :547-596), and at 1.1 B rows an
  * inference pass is a full extra scan.
  *
  * Type widening per SURVEY.md §1.3: unsigned ClickHouse types widen to
  * the next signed Spark type (u32→long, u8→short); Float32 money
  * columns stay FloatType (sums widen to double at aggregation time).
  */
object TripsSchemas {

  private def f(n: String, t: DataType, nullable: Boolean = true) =
    StructField(n, t, nullable)

  /** Raw staging CSV: 51 columns, positional, no header, `\N` = NULL —
    * the PostgreSQL export column order (reference README.md:311-365)
    * with the ClickHouse staging types (:448-506). */
  val tripsRaw: StructType = StructType(Seq(
    f("trip_id", LongType, nullable = false),
    f("vendor_id", StringType, nullable = false),
    f("pickup_datetime", TimestampType, nullable = false),
    f("dropoff_datetime", TimestampType),
    f("store_and_fwd_flag", StringType),
    f("rate_code_id", ShortType),
    f("pickup_longitude", DoubleType),
    f("pickup_latitude", DoubleType),
    f("dropoff_longitude", DoubleType),
    f("dropoff_latitude", DoubleType),
    f("passenger_count", ShortType),
    f("trip_distance", DoubleType),
    f("fare_amount", FloatType),
    f("extra", FloatType),
    f("mta_tax", FloatType),
    f("tip_amount", FloatType),
    f("tolls_amount", FloatType),
    f("ehail_fee", FloatType),
    f("improvement_surcharge", FloatType),
    f("total_amount", FloatType),
    f("payment_type", StringType),
    f("trip_type", ShortType),
    f("pickup", LongType),
    f("dropoff", LongType),
    f("cab_type", StringType),
    f("precipitation", FloatType),
    f("snow_depth", FloatType),
    f("snowfall", FloatType),
    f("max_temperature", ByteType),
    f("min_temperature", ByteType),
    f("average_wind_speed", FloatType),
    f("pickup_nyct2010_gid", ByteType),
    f("pickup_ctlabel", StringType),
    f("pickup_borocode", ByteType),
    f("pickup_boroname", StringType),
    f("pickup_ct2010", StringType),
    f("pickup_boroct2010", StringType),
    f("pickup_cdeligibil", StringType),
    f("pickup_ntacode", StringType),
    f("pickup_ntaname", StringType),
    f("pickup_puma", StringType),
    // reference quirk (SURVEY.md §2.8 #3): dropoff gid is UInt8 while
    // pickup is Int8 — widened u8→short here, signed byte above.
    f("dropoff_nyct2010_gid", ShortType),
    f("dropoff_ctlabel", StringType),
    f("dropoff_borocode", ShortType),
    f("dropoff_boroname", StringType),
    f("dropoff_ct2010", StringType),
    f("dropoff_boroct2010", StringType),
    f("dropoff_cdeligibil", StringType),
    f("dropoff_ntacode", StringType),
    f("dropoff_ntaname", StringType),
    f("dropoff_puma", StringType)))

  /** Enum domains from the reference DDL. */
  val cabTypes: Seq[String] = Seq("yellow", "green", "uber")

  /** vendor_id Enum8 domain (reference README.md:551) — codes 8-9 absent
    * in the reference too (quirk #4). */
  val vendorIds: Seq[String] = Seq("1", "2", "CMT", "VTS", "DDS", "B02512",
    "B02598", "B02617", "B02682", "B02764")

  /** payment_type canonicalization domain (reference README.md:572):
    * 21 spellings → 5 canon codes. */
  val paymentCanon: Map[String, Seq[String]] = Map(
    "CSH" -> Seq("CSH", "CASH", "Cash", "CAS", "Cas", "1"),
    "CRE" -> Seq("CRD", "Credit", "Cre", "CRE", "CREDIT", "2"),
    "NOC" -> Seq("NOC", "No Charge", "No", "3"),
    "DIS" -> Seq("DIS", "Dispute", "Dis", "4"))

  /** Dimension: cab_types(id, type). */
  val cabTypeDim: StructType = StructType(Seq(
    f("id", LongType, nullable = false), f("type", StringType, nullable = false)))

  /** Dimension: central_park_weather_observations (reference
    * README.md:338-343). */
  val weatherDim: StructType = StructType(Seq(
    f("date", DateType, nullable = false),
    f("precipitation", FloatType),
    f("snow_depth", FloatType),
    f("snowfall", FloatType),
    f("max_temperature", ByteType),
    f("min_temperature", ByteType),
    f("average_wind_speed", FloatType)))

  /** Dimension: nyct2010 census tracts (reference README.md:345-365);
    * gid is Long — deliberately NOT the reference's overflowing Int8
    * (quirk #3), the one quirk we fix rather than preserve. */
  val nyctDim: StructType = StructType(Seq(
    f("gid", LongType, nullable = false),
    f("ctlabel", StringType),
    f("borocode", ByteType),
    f("boroname", StringType),
    f("ct2010", StringType),
    f("boroct2010", StringType),
    f("cdeligibil", StringType),
    f("ntacode", StringType),
    f("ntaname", StringType),
    f("puma", StringType)))
}
