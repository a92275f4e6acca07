package graft.sources

import graft.SparkSpec
import graft.etl.SnapshotStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The pure-SQL read path over snapshot tables: reader-format and
  * catalog entry points must be row-identical to the Scala API
  * ([[SnapshotStore.read]]) including time travel, reuse Spark's
  * parquet pushdown machinery, and reject writes. */
class GraftSnapshotSqlSpec extends SparkSpec {

  import spark.implicits._

  private def mkRows(febPrice: Double) = Seq(
    (1L, "2024-01", java.sql.Timestamp.valueOf("2024-01-03 00:00:00"), 10.0),
    (2L, "2024-01", java.sql.Timestamp.valueOf("2024-01-20 00:00:00"), 20.0),
    (3L, "2024-02", java.sql.Timestamp.valueOf("2024-02-05 00:00:00"), febPrice),
    (4L, "2024-02", java.sql.Timestamp.valueOf("2024-02-25 00:00:00"), febPrice))
    .toDF("id", "m", "ts", "price")

  /** One two-snapshot table under a warehouse dir; returns
    * (warehouse, tableName, firstSnapshotId). */
  private def mkTable(tag: String): (String, String, Long) = {
    val wh = java.nio.file.Files
      .createTempDirectory(s"graft_snapwh_$tag").toString
    val name = "trips"
    val root = s"$wh/$name"
    val id1 = SnapshotStore.write(mkRows(30.0), root, "m", "ts")
    SnapshotStore.overwritePartitions(
      mkRows(99.0).filter(col("m") === "2024-02"), root, "m", "ts")
    (wh, name, id1)
  }

  private def rows(df: DataFrame): Set[(Long, String, Double)] =
    df.select("id", "m", "price").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet

  test("format(\"graft-snapshot\") equals SnapshotStore.read — current " +
      "pointer and asOf time travel") {
    val (wh, name, id1) = mkTable("fmt")
    val root = s"$wh/$name"
    assert(rows(spark.read.format("graft-snapshot").load(root)) ===
      rows(SnapshotStore.read(spark, root)))
    assert(rows(spark.read.format("graft-snapshot")
      .option("asOf", id1).load(root)) ===
      rows(SnapshotStore.read(spark, root, asOf = Some(id1))))
    // and the two states genuinely differ (the backfill restated feb)
    assert(rows(spark.read.format("graft-snapshot").load(root)) !==
      rows(spark.read.format("graft-snapshot")
        .option("asOf", id1).load(root)))
  }

  test("catalog: spark.sql over a registered name; VERSION AS OF " +
      "replays the pre-backfill snapshot; listTables sees the table") {
    val (wh, name, id1) = mkTable("cat")
    spark.conf.set("spark.sql.catalog.snaptest",
      classOf[GraftSnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.snaptest.warehouse", wh)
    val cur = spark.sql(
      s"SELECT m, sum(price) AS s FROM snaptest.$name GROUP BY m")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(cur === Map("2024-01" -> 30.0, "2024-02" -> 198.0))
    val asOf = spark.sql(
      s"SELECT m, sum(price) AS s FROM snaptest.$name " +
        s"VERSION AS OF $id1 GROUP BY m")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(asOf === Map("2024-01" -> 30.0, "2024-02" -> 60.0))
    // hash-equal to the Scala time-travel read
    assert(rows(spark.sql(s"SELECT * FROM snaptest.$name VERSION AS OF $id1"))
      === rows(SnapshotStore.read(spark, s"$wh/$name", asOf = Some(id1))))
    assert(spark.sql("SHOW TABLES IN snaptest").collect()
      .map(_.getString(1)).contains(name))
  }

  test("the SQL path reuses Spark's parquet machinery: filters push " +
      "into the scan, projection prunes the read schema") {
    val (wh, name, _) = mkTable("push")
    val df = spark.read.format("graft-snapshot").load(s"$wh/$name")
      .filter(col("id") > 2L).select("id", "price")
    df.queryExecution.toRdd.foreach(_ => ())
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,2)"),
      s"filter did not reach the parquet scan:\n$plan")
    assert(plan.contains("ReadSchema: struct<id:bigint,price:double>"),
      s"projection did not prune the scan:\n$plan")
  }

  test("table RENAME and retype ALTERs stay rejected (DROP/CREATE/ADD/" +
      "RENAME/DROP COLUMN are supported — SnapshotSqlDdlSpec); a " +
      "missing table is a proper NoSuchTableException") {
    val (wh, name, _) = mkTable("ro")
    spark.conf.set("spark.sql.catalog.snapro",
      classOf[GraftSnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.snapro.warehouse", wh)
    // retype to a non-widening type is refused by the widening gate
    // (only byte→short→int→long / float→double are read-compatible)
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE snapro.$name ALTER COLUMN price TYPE STRING")
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: chain(t.getCause)
    assert(e.getMessage.contains("read-compatible widenings"),
      s"unexpected failure shape: $e")
    // a missing table is a proper NoSuchTableException, not a crash
    val missing = intercept[Exception] {
      spark.sql("SELECT * FROM snapro.nope").collect()
    }
    assert(String.valueOf(missing.getMessage).toLowerCase
      .contains("table or view") ||
      missing.isInstanceOf[
        org.apache.spark.sql.catalyst.analysis.NoSuchTableException])
  }

  test("schema evolution surfaces through SQL: pre-evolution dirs read " +
      "the evolved column as null under the manifest schema") {
    val wh = java.nio.file.Files
      .createTempDirectory("graft_snapwh_evo").toString
    val root = s"$wh/evo"
    SnapshotStore.write(mkRows(30.0), root, "m", "ts")
    SnapshotStore.overwritePartitions(
      mkRows(99.0).filter(col("m") === "2024-02")
        .withColumn("note", lit("restated")), root, "m", "ts")
    val out = spark.read.format("graft-snapshot").load(root)
      .select("m", "note").distinct().collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toSet
    assert(out === Set("2024-01" -> None, "2024-02" -> Some("restated")))
  }
}
