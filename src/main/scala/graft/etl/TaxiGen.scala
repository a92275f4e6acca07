package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic taxi-shaped raw dataset (the reference's 51-column
  * denormalized export, README.md:311-365) derived from the driver's
  * lineitem table by PURE column arithmetic — no RNG, no UDFs — so the
  * exact same derivation is expressible in the DuckDB oracle and the
  * whole pipeline (CSV export → `\N` staging read → CTAS transform →
  * MergeTree-analogue write → benchmark queries) is end-to-end
  * hash-checkable at any scale factor.
  *
  * Column semantics mirror the reference data distributions in shape:
  * all 21 payment-type spellings (README.md:572) plus an out-of-domain
  * one that canonicalizes to UNK, the 3-value cab_type enum (:576), the
  * 10-value vendor domain (:551), NULLs injected on a deterministic
  * residue so every ifNull/assumeNotNull default path is exercised.
  */
object TaxiGen {

  /** The reference's 20 payment spellings + 1 unknown → UNK. */
  val paymentSpellings: Seq[String] = Seq(
    "CSH", "CASH", "Cash", "CAS", "Cas", "1",
    "CRD", "Credit", "Cre", "CRE", "CREDIT", "2",
    "NOC", "No Charge", "No", "3",
    "DIS", "Dispute", "Dis", "4",
    "XXX")

  private val boros =
    Seq("Manhattan", "Brooklyn", "Queens", "Bronx", "Staten Island")

  private def pick(values: Seq[String], idx: Column): Column =
    element_at(array(values.map(lit): _*), (idx + 1).cast("int"))

  /** One taxi row per lineitem row, in [[TripsSchemas.tripsRaw]] column
    * order. Null injections: passenger_count (l_partkey%7=0),
    * trip_distance (l_orderkey%11=0), dropoff_datetime
    * ((l_orderkey+l_linenumber)%10=0), rate_code_id (l_partkey%13=0),
    * store_and_fwd_flag (l_orderkey%5=4), weather columns (always). */
  def fromLineitem(li: DataFrame): DataFrame = {
    // l_shipdate is TIMESTAMP_NTZ in the testdata parquet; the UTC
    // session makes the cast a pure re-tag, no wall-time shift.
    def ts(offset: Column): Column =
      timestamp_micros(
        unix_micros(col("l_shipdate").cast("timestamp")) + offset * 1000000L)
    val pickupTs = ts(pmod(col("l_partkey"), lit(86400L)))
    val dropoffTs = ts(pmod(col("l_partkey"), lit(86400L)) +
      pmod(col("l_suppkey"), lit(7200L)) + 60L)
    li.select(
      (col("l_orderkey") * 10 + col("l_linenumber")).as("trip_id"),
      pick(TripsSchemas.vendorIds, pmod(col("l_suppkey"), lit(10L)))
        .as("vendor_id"),
      pickupTs.as("pickup_datetime"),
      when(pmod(col("l_orderkey") + col("l_linenumber"), lit(10L)) === 0,
        lit(null)).otherwise(dropoffTs).as("dropoff_datetime"),
      // residue 4 → the explicit null element (ANSI element_at errors
      // on out-of-range indexes, so the null is IN the array)
      element_at(
        array(lit("Y"), lit("N"), lit("1"), lit("2"),
          lit(null).cast("string")),
        (pmod(col("l_orderkey"), lit(5L)) + 1).cast("int"))
        .as("store_and_fwd_flag"),
      when(pmod(col("l_partkey"), lit(13L)) === 0, lit(null))
        .otherwise(pmod(col("l_partkey"), lit(7L)))
        .cast("smallint").as("rate_code_id"),
      (lit(-74.0) + pmod(col("l_partkey"), lit(2000L)) / 1000.0)
        .as("pickup_longitude"),
      (lit(40.5) + pmod(col("l_suppkey"), lit(1000L)) / 1000.0)
        .as("pickup_latitude"),
      (lit(-74.0) + pmod(col("l_suppkey"), lit(2000L)) / 1000.0)
        .as("dropoff_longitude"),
      (lit(40.5) + pmod(col("l_partkey"), lit(1000L)) / 1000.0)
        .as("dropoff_latitude"),
      when(pmod(col("l_partkey"), lit(7L)) === 0, lit(null))
        .otherwise(pmod(col("l_partkey"), lit(6L)) + 1)
        .cast("smallint").as("passenger_count"),
      when(pmod(col("l_orderkey"), lit(11L)) === 0, lit(null))
        .otherwise(col("l_quantity") / 4.0).as("trip_distance"),
      round(col("l_extendedprice") * 0.8, 0).cast("float").as("fare_amount"),
      lit(0.5f).as("extra"),
      lit(0.5f).as("mta_tax"),
      round(col("l_extendedprice") * 0.1, 0).cast("float").as("tip_amount"),
      lit(0.0f).as("tolls_amount"),
      lit(null).cast("float").as("ehail_fee"),
      lit(0.3f).as("improvement_surcharge"),
      round(col("l_extendedprice"), 0).cast("float").as("total_amount"),
      pick(paymentSpellings, pmod(col("l_partkey"), lit(21L)))
        .as("payment_type"),
      (pmod(col("l_orderkey"), lit(2L)) + 1).cast("smallint").as("trip_type"),
      col("l_partkey").as("pickup"),
      col("l_suppkey").as("dropoff"),
      when(pmod(col("l_orderkey"), lit(3L)) === 0, "yellow")
        .when(pmod(col("l_orderkey"), lit(3L)) === 1, "green")
        .otherwise("uber").as("cab_type"),
      lit(null).cast("float").as("precipitation"),
      lit(null).cast("float").as("snow_depth"),
      lit(null).cast("float").as("snowfall"),
      (pmod(col("l_partkey"), lit(60L)) - 10).cast("tinyint")
        .as("max_temperature"),
      (pmod(col("l_partkey"), lit(60L)) - 25).cast("tinyint")
        .as("min_temperature"),
      lit(null).cast("float").as("average_wind_speed"),
      pmod(col("l_partkey"), lit(100L)).cast("tinyint")
        .as("pickup_nyct2010_gid"),
      concat(lit("CT"), pmod(col("l_partkey"), lit(100L)).cast("string"))
        .as("pickup_ctlabel"),
      (pmod(col("l_partkey"), lit(5L)) + 1).cast("tinyint")
        .as("pickup_borocode"),
      pick(boros, pmod(col("l_partkey"), lit(5L))).as("pickup_boroname"),
      lpad(pmod(col("l_partkey"), lit(1000L)).cast("string"), 6, "0")
        .as("pickup_ct2010"),
      lpad(pmod(col("l_partkey"), lit(9999L)).cast("string"), 7, "0")
        .as("pickup_boroct2010"),
      pick(Seq("E", "I"), pmod(col("l_partkey"), lit(2L)))
        .as("pickup_cdeligibil"),
      concat(lit("MN"), pmod(col("l_partkey"), lit(80L)).cast("string"))
        .as("pickup_ntacode"),
      pick(boros, pmod(col("l_partkey"), lit(5L))).as("pickup_ntaname"),
      lpad(pmod(col("l_partkey"), lit(100L)).cast("string"), 4, "0")
        .as("pickup_puma"),
      pmod(col("l_suppkey"), lit(200L)).cast("smallint")
        .as("dropoff_nyct2010_gid"),
      concat(lit("CT"), pmod(col("l_suppkey"), lit(100L)).cast("string"))
        .as("dropoff_ctlabel"),
      (pmod(col("l_suppkey"), lit(5L)) + 1).cast("smallint")
        .as("dropoff_borocode"),
      pick(boros, pmod(col("l_suppkey"), lit(5L))).as("dropoff_boroname"),
      lpad(pmod(col("l_suppkey"), lit(1000L)).cast("string"), 6, "0")
        .as("dropoff_ct2010"),
      lpad(pmod(col("l_suppkey"), lit(9999L)).cast("string"), 7, "0")
        .as("dropoff_boroct2010"),
      pick(Seq("E", "I"), pmod(col("l_suppkey"), lit(2L)))
        .as("dropoff_cdeligibil"),
      concat(lit("BK"), pmod(col("l_suppkey"), lit(80L)).cast("string"))
        .as("dropoff_ntacode"),
      pick(boros, pmod(col("l_suppkey"), lit(5L))).as("dropoff_ntaname"),
      lpad(pmod(col("l_suppkey"), lit(100L)).cast("string"), 4, "0")
        .as("dropoff_puma"))
  }
}
