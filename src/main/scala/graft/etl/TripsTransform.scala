package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The staging→analytic transform (SURVEY.md §2.8; reference CTAS at
  * README.md:547-596): null-default materialization, enum
  * canonicalization, date derivation, fixed-string padding. A pure
  * `DataFrame => DataFrame` of codegen'd built-ins — zero UDFs, so the
  * whole 50-expression map stage is one WholeStageCodegen span over the
  * scan at any scale.
  *
  * `strictCompat = true` preserves the reference's quirks (SURVEY.md
  * §2.8 quirks 1-2): the boroname-mislabeled-as-ct2010 columns and the
  * `payment_type_` trailing-underscore name. `false` fixes them.
  */
object TripsTransform {

  /** ClickHouse `assumeNotNull` semantics: NULL → the type's default
    * (reference README.md:556-593 relies on this for every column). */
  private def nn(c: Column, default: Any): Column = coalesce(c, lit(default))

  private val epoch0 = to_timestamp(lit("1970-01-01 00:00:00"))

  /** payment_type canonicalization (reference README.md:572): 21
    * spellings → {CSH, CRE, NOC, DIS}, anything else → UNK. */
  def canonPaymentType(c: Column): Column =
    TripsSchemas.paymentCanon.foldLeft(when(lit(false), lit("UNK"))) {
      case (acc, (canon, spellings)) =>
        acc.when(c.isin(spellings: _*), canon)
    }.otherwise("UNK")

  /** Validating enum cast (ClickHouse CAST-to-Enum8 throws on unmapped
    * values, reference README.md:551/:576): out-of-domain → runtime
    * error, matching the reference's load-time failure semantics. */
  def enumCast(c: Column, domain: Seq[String], name: String): Column =
    when(c.isin(domain: _*) || c.isNull, c)
      .otherwise(raise_error(concat(
        lit(s"invalid $name enum value: "), c)))

  def apply(raw: DataFrame, strictCompat: Boolean = true): DataFrame = {
    val ct2010Pick =
      if (strictCompat) nn(col("pickup_boroname"), "")   // quirk #1
      else nn(col("pickup_ct2010"), "")
    val ct2010Drop =
      if (strictCompat) nn(col("dropoff_boroname"), "")
      else nn(col("dropoff_ct2010"), "")
    val payCol = if (strictCompat) "payment_type_" else "payment_type"

    raw.select(
      col("trip_id"),
      enumCast(col("vendor_id"), TripsSchemas.vendorIds, "vendor_id")
        .as("vendor_id"),
      col("pickup_datetime"),
      to_date(col("pickup_datetime")).as("pickup_date"),
      coalesce(col("dropoff_datetime"), epoch0).as("dropoff_datetime"),
      coalesce(to_date(col("dropoff_datetime")), to_date(epoch0))
        .as("dropoff_date"),
      // store_and_fwd_flag IN ('Y','1','2') stored as 0/1 (ref :556);
      // NULL IN (...) is NULL in Spark, 0 in ClickHouse UInt8 context.
      coalesce(col("store_and_fwd_flag").isin("Y", "1", "2")
        .cast("tinyint"), lit(0.toByte)).as("store_and_fwd_flag"),
      nn(col("rate_code_id"), 0.toShort).as("rate_code_id"),
      nn(col("pickup_longitude"), 0.0).as("pickup_longitude"),
      nn(col("pickup_latitude"), 0.0).as("pickup_latitude"),
      nn(col("dropoff_longitude"), 0.0).as("dropoff_longitude"),
      nn(col("dropoff_latitude"), 0.0).as("dropoff_latitude"),
      nn(col("passenger_count"), 0.toShort).as("passenger_count"),
      nn(col("trip_distance"), 0.0).as("trip_distance"),
      nn(col("fare_amount"), 0.0f).as("fare_amount"),
      nn(col("extra"), 0.0f).as("extra"),
      nn(col("mta_tax"), 0.0f).as("mta_tax"),
      nn(col("tip_amount"), 0.0f).as("tip_amount"),
      nn(col("tolls_amount"), 0.0f).as("tolls_amount"),
      nn(col("ehail_fee"), 0.0f).as("ehail_fee"),
      nn(col("improvement_surcharge"), 0.0f).as("improvement_surcharge"),
      nn(col("total_amount"), 0.0f).as("total_amount"),
      canonPaymentType(col("payment_type")).as(payCol),
      nn(col("trip_type"), 0.toShort).as("trip_type"),
      nn(col("pickup"), 0L).as("pickup"),
      nn(col("dropoff"), 0L).as("dropoff"),
      enumCast(nn(col("cab_type"), "yellow"), TripsSchemas.cabTypes,
        "cab_type").as("cab_type"),
      nn(col("precipitation"), 0.0f).as("precipitation"),
      nn(col("snow_depth"), 0.0f).as("snow_depth"),
      nn(col("snowfall"), 0.0f).as("snowfall"),
      nn(col("max_temperature"), 0.toByte).as("max_temperature"),
      nn(col("min_temperature"), 0.toByte).as("min_temperature"),
      nn(col("average_wind_speed"), 0.0f).as("average_wind_speed"),
      nn(col("pickup_nyct2010_gid"), 0.toByte).as("pickup_nyct2010_gid"),
      nn(col("pickup_ctlabel"), "").as("pickup_ctlabel"),
      nn(col("pickup_borocode"), 0.toByte).as("pickup_borocode"),
      nn(col("pickup_boroname"), "").as("pickup_boroname"),
      ct2010Pick.as("pickup_ct2010"),
      // toFixedString(…, 7)/(…, 4) (ref :581/:583): length-validated
      // strings; parquet has no fixed width, rpad preserves semantics.
      rpad(nn(col("pickup_boroct2010"), ""), 7, " ").as("pickup_boroct2010"),
      nn(col("pickup_cdeligibil"), "").as("pickup_cdeligibil"),
      rpad(nn(col("pickup_ntacode"), ""), 4, " ").as("pickup_ntacode"),
      nn(col("pickup_ntaname"), "").as("pickup_ntaname"),
      nn(col("pickup_puma").cast("int"), 0).as("pickup_puma"),
      nn(col("dropoff_nyct2010_gid"), 0.toShort).as("dropoff_nyct2010_gid"),
      nn(col("dropoff_ctlabel"), "").as("dropoff_ctlabel"),
      nn(col("dropoff_borocode"), 0.toShort).as("dropoff_borocode"),
      nn(col("dropoff_boroname"), "").as("dropoff_boroname"),
      ct2010Drop.as("dropoff_ct2010"),
      rpad(nn(col("dropoff_boroct2010"), ""), 7, " ").as("dropoff_boroct2010"),
      nn(col("dropoff_cdeligibil"), "").as("dropoff_cdeligibil"),
      rpad(nn(col("dropoff_ntacode"), ""), 4, " ").as("dropoff_ntacode"),
      nn(col("dropoff_ntaname"), "").as("dropoff_ntaname"),
      nn(col("dropoff_puma").cast("int"), 0).as("dropoff_puma"))
      .withColumn("pickup_month", date_format(col("pickup_date"), "yyyy-MM"))
  }
}
