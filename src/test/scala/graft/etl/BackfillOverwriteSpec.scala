package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BackfillOverwriteSpec extends SparkSpec {

  private def listParts(dir: String): Set[String] = {
    val f = new java.io.File(dir)
    if (!f.exists()) Set.empty
    else f.listFiles().map(_.getName).filter(_.endsWith(".parquet")).toSet
  }

  test("dynamic overwrite replaces exactly the restated month; " +
      "static mode would drop the rest (negative control)") {
    import spark.implicits._
    def mkRows(price: Double) = Seq(
      (1L, "2024-01", java.sql.Timestamp.valueOf("2024-01-03 00:00:00"), 10.0),
      (2L, "2024-01", java.sql.Timestamp.valueOf("2024-01-20 00:00:00"), 20.0),
      (3L, "2024-02", java.sql.Timestamp.valueOf("2024-02-05 00:00:00"), price),
      (4L, "2024-02", java.sql.Timestamp.valueOf("2024-02-25 00:00:00"), price))
      .toDF("id", "m", "ts", "price")
    val base = java.nio.file.Files
      .createTempDirectory("graft_backfill_spec").toString

    // full load, then restate ONLY 2024-02
    val out = s"$base/dyn"
    MergeTreeWriter.write(mkRows(30.0), out, monthCol = "m", sortCol = "ts")
    val janBefore = listParts(s"$out/m=2024-01")
    assert(janBefore.nonEmpty)
    val corrected = mkRows(99.0).filter(col("m") === "2024-02")
    MergeTreeWriter.overwritePartitions(corrected, out,
      monthCol = "m", sortCol = "ts")

    // untouched partition: same physical files, not a rewrite
    assert(listParts(s"$out/m=2024-01") === janBefore)
    // restated partition reflects the correction, others the original
    val back = MergeTreeWriter.read(spark, out)
      .groupBy("m").agg(sum("price").as("s")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(back === Map("2024-01" -> 30.0, "2024-02" -> 198.0))
    // conf did not leak
    assert(!spark.conf
      .getOption("spark.sql.sources.partitionOverwriteMode")
      .exists(_.equalsIgnoreCase("dynamic")))

    // negative control: the same write under static mode drops the
    // untouched month — the failure mode overwritePartitions exists
    // to prevent
    val outStatic = s"$base/static"
    MergeTreeWriter.write(mkRows(30.0), outStatic,
      monthCol = "m", sortCol = "ts")
    corrected.write.mode("overwrite").partitionBy("m").parquet(outStatic)
    assert(listParts(s"$outStatic/m=2024-01").isEmpty)
    assert(MergeTreeWriter.read(spark, outStatic)
      .select("m").distinct().collect().map(_.getString(0)).toSeq ===
      Seq("2024-02"))
  }
}
