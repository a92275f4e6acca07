package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Column-ID `RENAME COLUMN` ([[SnapshotStore.renameColumns]]): the
  * field keeps its stable id and PHYSICAL file name; only the
  * manifest's logical name (plus stats keys and layout props) moves.
  * Old parquet files stay readable through the physical-schema read
  * projection; new writes land under the SAME physical names; time
  * travel before the rename sees the old names. */
class SnapshotRenameSpec extends SparkSpec {

  import spark.implicits._

  private def mkRoot(tag: String): String = java.nio.file.Files
    .createTempDirectory(s"graft_rename_$tag").toString

  private def register(cat: String, wh: String): Unit = {
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftSnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
  }

  test("Scala API: a legacy (unstamped) table adopts ids on first " +
      "rename; old files read under the new logical name; time travel " +
      "before the rename keeps the old one; stats keys re-key") {
    val root = mkRoot("adopt")
    val df = Seq((1L, "2024-01", 10.0), (2L, "2024-02", 20.0))
      .toDF("id", "m", "price")
    SnapshotStore.write(df, root, "m", "id")
    val preId = SnapshotStore.current(root).get.id
    SnapshotStore.renameColumns(root, Seq("price" -> "total"))
    val m = SnapshotStore.current(root).get
    val f = m.schema.get.fields.find(_.name == "total").get
    assert(f.metadata.getString(SnapshotStore.PhysKey) === "price",
      "the physical name must stay what the files spell")
    assert(f.metadata.contains(SnapshotStore.FieldIdKey))
    // pre-rename files read under the new logical name
    val got = SnapshotStore.read(spark, root)
      .select("id", "total").as[(Long, Double)].collect().toMap
    assert(got === Map(1L -> 10.0, 2L -> 20.0))
    // stats re-keyed: pruning evidence follows the new name
    assert(m.entries.forall(_.stats.exists(_.cols.contains("total"))))
    assert(m.entries.forall(_.stats.forall(!_.cols.contains("price"))))
    // time travel BEFORE the rename sees the old shape
    val old = SnapshotStore.read(spark, root, asOf = Some(preId))
    assert(old.columns.contains("price") && !old.columns.contains("total"))
  }

  test("renaming the partition / sort columns re-keys the layout " +
      "props; appends, token-addressed ops and the spec all follow") {
    val root = mkRoot("layout")
    val df = Seq((1L, "2024-01", 1), (2L, "2024-02", 2))
      .toDF("id", "m", "v")
    SnapshotStore.write(df, root, "m", "id")
    SnapshotStore.renameColumns(root, Seq("m" -> "month", "id" -> "key"))
    val m = SnapshotStore.current(root).get
    assert(SnapshotStore.tableLayout(m) === Some(("month", "key")))
    // an append under the NEW names lands in the same partitions
    SnapshotStore.appendPartitions(
      Seq((3L, "2024-01", 3)).toDF("key", "month", "v"),
      root, "month", "key")
    val got = SnapshotStore.read(spark, root)
      .groupBy("month").agg(sum("v").as("s"))
      .as[(String, Long)].collect().toMap
    assert(got === Map("2024-01" -> 4L, "2024-02" -> 2L))
    // partition-granular drop by token still addresses the same dirs
    SnapshotStore.dropPartitions(root, Some(Set("2024-02")))
    assert(SnapshotStore.read(spark, root).count() === 2L)
  }

  test("SQL lifecycle: ALTER TABLE RENAME COLUMN, mixed old/new files, " +
      "DML on renamed columns, column pruning and filters stay exact") {
    val wh = mkRoot("sql")
    register("snapren1", wh)
    spark.sql(
      """CREATE TABLE snapren1.t (id BIGINT, m STRING, price DOUBLE)
        |PARTITIONED BY (m) TBLPROPERTIES ('sort_col' = 'id')"""
        .stripMargin)
    spark.sql("INSERT INTO snapren1.t VALUES " +
      "(1, '2024-01', 10.0), (2, '2024-02', 20.0)")
    spark.sql("ALTER TABLE snapren1.t RENAME COLUMN price TO total")
    // old name gone, new name resolves
    intercept[Exception](spark.sql("SELECT price FROM snapren1.t").collect())
    assert(spark.sql("SELECT sum(total) FROM snapren1.t")
      .head().getDouble(0) === 30.0)
    // post-rename INSERT writes files under the INVARIANT physical
    // name; a read then mixes pre- and post-rename files in one scan
    spark.sql("INSERT INTO snapren1.t VALUES (3, '2024-03', 30.0)")
    assert(spark.sql("SELECT sum(total) FROM snapren1.t")
      .head().getDouble(0) === 60.0)
    // single-column projection + filter on the renamed column (the
    // DSV2 pruning/pushdown translation path)
    val one = spark.sql(
      "SELECT total FROM snapren1.t WHERE total > 25.0").collect()
    assert(one.map(_.getDouble(0)).toSet === Set(30.0))
    // row-level DML through the new name
    spark.sql("UPDATE snapren1.t SET total = total + 1.0 WHERE id = 1")
    spark.sql("DELETE FROM snapren1.t WHERE total > 29.0")
    assert(spark.sql("SELECT sum(total) FROM snapren1.t")
      .head().getDouble(0) === 31.0)
    // MERGE through the new name
    Seq((2L, 99.0)).toDF("k", "p").createOrReplaceTempView("ren_chg")
    spark.sql(
      """MERGE INTO snapren1.t AS t USING ren_chg AS s ON t.id = s.k
        |WHEN MATCHED THEN UPDATE SET total = s.p""".stripMargin)
    assert(spark.sql("SELECT total FROM snapren1.t WHERE id = 2")
      .head().getDouble(0) === 99.0)
  }

  test("CDC sidecars written BEFORE a rename replay under the NEW " +
      "logical names (sidecar files spell physical names)") {
    val wh = mkRoot("cdc")
    register("snapren2", wh)
    spark.sql(
      """CREATE TABLE snapren2.t (id BIGINT, m STRING, price DOUBLE)
        |PARTITIONED BY (m) TBLPROPERTIES ('sort_col' = 'id')"""
        .stripMargin)
    val root = s"$wh/t"
    spark.sql("INSERT INTO snapren2.t VALUES " +
      "(1, '2024-01', 10.0), (2, '2024-01', 20.0)")
    spark.sql("UPDATE snapren2.t SET price = price + 5.0 WHERE id = 1")
    val dmlSeq = SnapshotStore.currentSeq(root)
    spark.sql("ALTER TABLE snapren2.t RENAME COLUMN price TO total")
    val renameSeq = SnapshotStore.currentSeq(root)
    // the range spans the rename commit (itself silent: entries carry
    // by reference, so its dir diff is empty) — rows read under the TO
    // endpoint's RENAMED schema, while the sidecar files spell the
    // physical pre-rename name
    val feed = SnapshotStore.changeFeed(spark, root, dmlSeq - 1, renameSeq)
    assert(feed.columns.contains("total"))
    val rows = feed.select("_change_type", "total")
      .as[(String, Double)].collect().toSet
    assert(rows === Set(("update_preimage", 10.0),
      ("update_postimage", 15.0)))
  }

  test("refusals: rename to an existing/reserved/physically-taken " +
      "name, swaps; adding a column that collides with a PHYSICAL " +
      "name; the physical mapping is FROZEN across full rewrites") {
    val root = mkRoot("guard")
    val df = Seq((1L, "2024-01", 1.0)).toDF("id", "m", "price")
    SnapshotStore.write(df, root, "m", "id")
    SnapshotStore.renameColumns(root, Seq("price" -> "total"))
    intercept[IllegalArgumentException](
      SnapshotStore.renameColumns(root, Seq("total" -> "id")))
    intercept[IllegalArgumentException](
      SnapshotStore.renameColumns(root, Seq("total" -> "_change_type")))
    intercept[IllegalArgumentException](
      SnapshotStore.renameColumns(root, Seq("total" -> "__part")))
    intercept[IllegalArgumentException](
      SnapshotStore.renameColumns(root, Seq("nope" -> "x")))
    // the freed LOGICAL spelling stays taken PHYSICALLY: files spell
    // 'price' forever, so neither a rename onto it nor re-adding it
    // can be allowed (two file columns of one name)
    intercept[IllegalArgumentException](
      SnapshotStore.renameColumns(root, Seq("id" -> "price")))
    intercept[IllegalArgumentException](
      SnapshotStore.addColumns(root, Seq(
        org.apache.spark.sql.types.StructField("price",
          org.apache.spark.sql.types.IntegerType))))
    // one-statement SWAPS are refused (the write path's sequential
    // logical→physical renames would collide mid-fold)
    intercept[IllegalArgumentException](
      SnapshotStore.renameColumns(root, Seq("id" -> "total",
        "total" -> "id")))
    // a DIFFERENT new column is fine
    SnapshotStore.addColumns(root, Seq(
      org.apache.spark.sql.types.StructField("extra",
        org.apache.spark.sql.types.IntegerType)))
    // a full rewrite KEEPS the frozen physical name and the stable id:
    // retained pre-rewrite dirs/sidecars still spell 'price', so a
    // feed or read spanning the compaction must keep mapping — and the
    // compacted files keep spelling it too
    val preId = SnapshotStore.current(root).get.schema.get
      .fields.find(_.name == "total").get
      .metadata.getLong(SnapshotStore.FieldIdKey)
    SnapshotStore.compact(spark, root, "m", "id")
    val f = SnapshotStore.current(root).get.schema.get
      .fields.find(_.name == "total").get
    assert(SnapshotStore.physName(f) === "price",
      "the physical file name is frozen for the field's lifetime")
    assert(f.metadata.getLong(SnapshotStore.FieldIdKey) === preId,
      "the stable field id survives the rewrite")
    assert(SnapshotStore.read(spark, root)
      .select("total").as[Double].collect().toSeq === Seq(1.0))
  }

  test("a change feed SPANNING a post-rename compaction keeps the " +
      "renamed column's values (the mapping never collapses)") {
    val wh = mkRoot("feedspan")
    register("snapren3", wh)
    spark.sql(
      """CREATE TABLE snapren3.t (id BIGINT, m STRING, price DOUBLE)
        |PARTITIONED BY (m) TBLPROPERTIES ('sort_col' = 'id')"""
        .stripMargin)
    val root = s"$wh/t"
    spark.sql("INSERT INTO snapren3.t VALUES (1, '2024-01', 10.0)")
    spark.sql("ALTER TABLE snapren3.t RENAME COLUMN price TO total")
    val preAppend = SnapshotStore.currentSeq(root)
    // post-rename append, then a compaction: both write files that
    // must keep spelling the FROZEN physical name 'price'
    spark.sql("INSERT INTO snapren3.t VALUES (2, '2024-02', 20.0)")
    spark.sql(s"CALL snapren3.system.compact('${new java.io.File(root)
      .getName}')")
    val head = SnapshotStore.currentSeq(root)
    val feed = SnapshotStore.changeFeed(spark, root, preAppend, head)
    // the appended row arrives with its VALUE intact under the new
    // logical name; the compaction emits nothing (empty sidecar)
    val rows = feed.select("_change_type", "id", "total")
      .as[(String, Long, Double)].collect().toSet
    assert(rows === Set(("insert", 2L, 20.0)))
    // and the compacted table reads both eras' values
    assert(spark.sql("SELECT sum(total) FROM snapren3.t")
      .head().getDouble(0) === 30.0)
    // the DSV2 batch CDF face shares the stream planner — over the
    // renamed table it must emit the same rows under the LOGICAL name
    val dsv2 = spark.read.format("graft-snapshot")
      .option("readChangeFeed", "true")
      .option("startingSeq", preAppend).option("endingSeq", head)
      .load(root)
      .select("_change_type", "id", "total")
      .as[(String, Long, Double)].collect().toSet
    assert(dsv2 === Set(("insert", 2L, 20.0)))
  }

  test("a pushed filter on a renamed column reaches the parquet scan " +
      "under the PHYSICAL file name (row-group pruning survives)") {
    val wh = mkRoot("push")
    register("snapren4", wh)
    spark.sql(
      """CREATE TABLE snapren4.t (id BIGINT, m STRING, price DOUBLE)
        |PARTITIONED BY (m) TBLPROPERTIES ('sort_col' = 'id')"""
        .stripMargin)
    spark.sql("INSERT INTO snapren4.t VALUES " +
      "(1, '2024-01', 10.0), (2, '2024-02', 20.0)")
    spark.sql("ALTER TABLE snapren4.t RENAME COLUMN price TO total")
    val q = spark.sql("SELECT total FROM snapren4.t WHERE total > 15.0")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThan(price,15.0)"),
      s"the pushed filter must spell the PHYSICAL column name:\n$plan")
    assert(q.collect().map(_.getDouble(0)).toSeq === Seq(20.0))
  }
}
