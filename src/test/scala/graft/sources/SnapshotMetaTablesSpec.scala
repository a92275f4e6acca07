package graft.sources

import graft.SparkSpec
import graft.etl.SnapshotStore
import graft.operators.RowLevelOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** `table$kind` metadata inspection tables ([[GraftMetaTables]]):
  * history / partitions / files / refs, each driver-materialized from
  * the manifest and consistent with the Scala APIs they mirror. */
class SnapshotMetaTablesSpec extends SparkSpec {

  private def rows(): DataFrame = {
    import spark.implicits._
    (1 to 60).map(i => (i.toLong, if (i <= 40) "2024-01" else "2024-02",
      java.sql.Date.valueOf("2024-01-05"), i * 2.0))
      .toDF("id", "m", "d", "price")
  }

  private def tmpRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_meta_$tag").toString

  private def register(root: String): String = {
    val f = new java.io.File(root)
    spark.conf.set("spark.sql.catalog.graftmeta",
      classOf[graft.sources.GraftSnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftmeta.warehouse", f.getParent)
    f.getName
  }

  test("$partitions and $files report per-value live rows, DV " +
      "positions and entry counts; both are scan-free LocalScans") {
    val root = tmpRoot("parts")
    SnapshotStore.write(rows(), root, "m", "id")
    // DV delete of 4 rows in month 1 (ids 10,20,30,40)
    RowLevelOps.deleteRowsCommit(spark, root,
      col("id") % 10 === 0 && col("m") === "2024-01", "m", "id")
    require(SnapshotStore.current(root).get.entries.exists(_.dv.isDefined))
    val n = register(root)
    val parts = spark.sql(
      s"SELECT * FROM graftmeta.`$n$$partitions` ORDER BY value")
      .collect()
    assert(parts.map(_.getString(0)).toSeq === Seq("2024-01", "2024-02"))
    assert(parts.map(_.getLong(2)).toSeq === Seq(36L, 20L)) // live
    assert(parts.map(_.getLong(3)).toSeq === Seq(4L, 0L)) // dv
    val files = spark.sql(s"SELECT * FROM graftmeta.`$n$$files`")
    assert(files.collect().map(r =>
      (r.getString(0), r.getLong(3))).toSeq.sorted ===
      Seq(("2024-01", 36L), ("2024-02", 20L)))
    // LocalScan: no BatchScan / file scan in either plan
    val plan = files.queryExecution.executedPlan.toString
    assert(!plan.contains("BatchScan") && !plan.contains("FileScan"))
  }

  test("$history mirrors SnapshotStore.history (seq, id, live rows, " +
      "wall time); $refs lists tags and branches with their heads") {
    val root = tmpRoot("hist")
    val id1 = SnapshotStore.write(rows(), root, "m", "id")
    val seq1 = SnapshotStore.currentSeq(root)
    import spark.implicits._
    val id2 = SnapshotStore.appendPartitions(
      Seq((1000L, "2024-03", java.sql.Date.valueOf("2024-03-01"), 5.0))
        .toDF("id", "m", "d", "price"), root, "m", "id")
    SnapshotStore.tag(root, "v1", seq1)
    SnapshotStore.branch(root, "audit")
    val n = register(root)
    val hist = spark.sql(
      s"SELECT seq, id, live_rows, committed_at FROM " +
        s"graftmeta.`$n$$history` ORDER BY seq").collect()
    val api = SnapshotStore.history(root)
    assert(hist.map(_.getLong(1)).toSeq === api.map(_.id))
    assert(hist.map(_.getLong(2)).toSeq === Seq(60L, 61L))
    assert(hist.forall(!_.isNullAt(3)), "every commit is wall-stamped")
    val refs = spark.sql(
      s"SELECT name, kind, snapshot_id FROM graftmeta.`$n$$refs` " +
        "ORDER BY kind, name").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(refs === Seq(("audit", "branch", id2), ("v1", "tag", id1)))
  }

  test("unknown $kind and $kind on a missing base table both fail " +
      "loudly; a real table is never shadowed") {
    val root = tmpRoot("err")
    SnapshotStore.write(rows(), root, "m", "id")
    val n = register(root)
    val e1 = intercept[Exception](
      spark.sql(s"SELECT * FROM graftmeta.`$n$$bogus`").collect())
    assert(e1.getMessage.contains("TABLE_OR_VIEW_NOT_FOUND") ||
      e1.getMessage.contains("cannot be found"))
    val e2 = intercept[Exception](
      spark.sql(s"SELECT * FROM graftmeta.`nope$$history`").collect())
    assert(e2.getMessage.contains("TABLE_OR_VIEW_NOT_FOUND") ||
      e2.getMessage.contains("cannot be found"))
  }
}
