package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The denormalization export joins (SURVEY.md §2.3 J1-J4; reference
  * README.md:366-374): four LEFT OUTER equi-joins of a ~1.1 B-row fact
  * against KB-sized dimensions. Every dimension is explicitly
  * `broadcast(...)`: at 100 TB the fact side must never shuffle for a
  * dimension lookup, and broadcast-hash keeps the whole denormalization
  * a single map-side stage.
  */
object DimJoins {

  /** J1: trips ⟕ cab_types on the surrogate key (ref :367-368). */
  def joinCabTypes(trips: DataFrame, cabTypes: DataFrame): DataFrame =
    trips.join(broadcast(cabTypes.withColumnRenamed("type", "cab_type")),
      trips("cab_type_id") === cabTypes("id"), "left")
      .drop("id")

  /** J2: trips ⟕ weather on a CAST-expression key — `weather.date =
    * pickup_datetime::date` (ref :369-370), the reference's only
    * non-column equi condition. */
  def joinWeather(trips: DataFrame, weather: DataFrame): DataFrame =
    trips.join(broadcast(weather),
      weather("date") === to_date(trips("pickup_datetime")), "left")
      .drop("date")

  /** J3+J4: the same census-tract dimension joined twice under pickup /
    * dropoff role aliases (ref :371-374) — 10 identically-named columns
    * disambiguated by prefixing, like the export SELECT list
    * (ref :345-365). */
  def joinTracts(trips: DataFrame, nyct: DataFrame): DataFrame = {
    def prefixed(prefix: String): DataFrame =
      nyct.columns.foldLeft(nyct)((df, c) =>
        df.withColumnRenamed(c, s"${prefix}_$c"))
    trips
      .join(broadcast(prefixed("pickup")),
        trips("pickup_nyct2010_gid") === col("pickup_gid"), "left")
      .drop("pickup_gid")
      .join(broadcast(prefixed("dropoff")),
        trips("dropoff_nyct2010_gid") === col("dropoff_gid"), "left")
      .drop("dropoff_gid")
  }

  /** The full export denormalization: J1 → J2 → J3/J4 chained, all
    * broadcast, zero shuffles of the fact side. */
  def denormalize(trips: DataFrame, cabTypes: DataFrame,
      weather: DataFrame, nyct: DataFrame): DataFrame =
    joinTracts(joinWeather(joinCabTypes(trips, cabTypes), weather), nyct)
}
