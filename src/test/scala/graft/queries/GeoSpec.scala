package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sanity anchors for the geo surface: haversine against known
  * great-circle distances, bin stability, and the two lanes' shapes on
  * the driver fixture. */
class GeoSpec extends SparkSpec {
  import spark.implicits._

  private def hav(plat: Double, plon: Double, dlat: Double,
      dlon: Double): Double = {
    val df = Seq((plat, plon, dlat, dlon))
      .toDF("plat", "plon", "dlat", "dlon")
    val dphi = radians(col("dlat") - col("plat")) / 2.0
    val dlam = radians(col("dlon") - col("plon")) / 2.0
    val a = sin(dphi) * sin(dphi) +
      cos(radians(col("plat"))) * cos(radians(col("dlat"))) *
        sin(dlam) * sin(dlam)
    df.select((lit(2.0 * 6371.0088) * asin(sqrt(a))).as("km"))
      .head().getDouble(0)
  }

  test("haversine anchors: zero, meridian degree, equator degree") {
    assert(hav(40.7, -74.0, 40.7, -74.0) === 0.0)
    // one degree of latitude ≈ 111.19 km everywhere (mean-radius model)
    assert(math.abs(hav(40.0, -74.0, 41.0, -74.0) - 111.195) < 0.01)
    // one degree of longitude at the equator ≈ the same arc
    assert(math.abs(hav(0.0, 0.0, 0.0, 1.0) - 111.195) < 0.01)
    // at 60°N a longitude degree shrinks by cos(60°) = 0.5
    assert(math.abs(hav(60.0, 0.0, 60.0, 1.0) - 111.195 / 2) < 0.05)
    // symmetry
    assert(hav(40.5, -74.0, 41.2, -73.2) ===
      hav(41.2, -73.2, 40.5, -74.0))
  }

  test("distance lane: all trips inside the coordinate box bound") {
    val r = RelationalQueries.q48GeoDistance(spark, sf()).collect()
    assert(r.length == 3)
    // box is 2° lon × 1° lat near 40.5-41.5N → max possible great
    // circle well under 300 km; averages positive
    r.foreach { row =>
      assert(row.getAs[Double]("max_km") < 300.0)
      assert(row.getAs[Double]("avg_km") > 0.0)
      assert(row.getAs[Double]("min_km") >= 0.0)
    }
  }

  test("OD flows: at most 3 flows per origin, rank follows count then " +
    "cell order") {
    val rows = RelationalQueries.q50GeoOdFlows(spark, sf()).collect()
    val byOrigin = rows.groupBy(r =>
      (r.getAs[Long]("o_lat"), r.getAs[Long]("o_lon")))
    assert(byOrigin.values.forall(_.length <= 3))
    byOrigin.values.foreach { fs =>
      val sorted = fs.sortBy(_.getAs[Long]("flow_rank"))
      assert(sorted.map(_.getAs[Long]("flow_rank")).toSeq ===
        (1L to sorted.length).toSeq, "ranks are 1..k dense")
      // counts non-increasing along the rank
      val counts = sorted.map(_.getAs[Long]("n_trips")).toSeq
      assert(counts === counts.sorted.reverse, "count order")
    }
  }

  test("zone assignment: every zone non-empty, counts conserve rows") {
    val z = RelationalQueries.q51GeoZoneAssign(spark, sf()).collect()
      .map(r => r.getAs[String]("zone") -> r.getAs[Long]("n_pickups"))
      .toMap
    assert(z.keySet === Set("tri_south", "diamond_mid", "circle_east",
      "rect_north", "NONE"), s"zones: ${z.keySet}")
    assert(z.values.forall(_ > 0))
    assert(z.values.sum ==
      graft.Tables.lineitem(spark, sf()).count())
  }

  test("grid lane: cells cover exactly the planted coordinate box") {
    val cells = RelationalQueries.q49GeoGridCells(spark, sf()).collect()
    val lats = cells.map(_.getAs[Long]("cell_lat"))
    val lons = cells.map(_.getAs[Long]("cell_lon"))
    assert(lats.min >= 4050L && lats.max < 4150L, "lat ∈ [40.5, 41.5)")
    assert(lons.min >= -7400L && lons.max < -7200L, "lon ∈ [-74, -72)")
    // counts conserve rows
    val total = cells.map(_.getAs[Long]("n_pickups")).sum
    assert(total == graft.Tables.lineitem(spark, sf()).count())
  }
}
