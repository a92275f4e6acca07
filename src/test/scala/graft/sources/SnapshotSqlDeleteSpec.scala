package graft.sources

import graft.SparkSpec
import graft.etl.SnapshotStore

/** SQL `DELETE FROM` over snapshot tables — the atomic DROP PARTITION:
  * partition-value predicates commit metadata-only through the locked
  * [[SnapshotStore.dropPartitions]]; row-level predicates are rejected
  * at analysis (deletes are partition-granular by design). */
class SnapshotSqlDeleteSpec extends SparkSpec {

  import spark.implicits._

  private def mkRows() = Seq(
    (1L, "2024-01", 1, 10.0), (2L, "2024-01", 2, 20.0),
    (3L, "2024-02", 3, 30.0), (4L, "2024-02", 4, 40.0),
    (5L, "2024-03", 5, 50.0))
    .toDF("id", "m", "v", "price")

  private def mkTable(tag: String): (String, String) = {
    val wh = java.nio.file.Files
      .createTempDirectory(s"graft_snapdel_$tag").toString
    SnapshotStore.write(mkRows(), s"$wh/t", "m", "v")
    (wh, s"$wh/t")
  }

  private def register(cat: String, wh: String): Unit = {
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[GraftSnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
  }

  test("DELETE of one partition is a metadata-only commit: survivors " +
      "carried by the SAME dirs, no data written, dropped dirs intact " +
      "for time travel") {
    val (wh, root) = mkTable("one")
    register("snapd1", wh)
    val before = SnapshotStore.current(root).get
    val dirsBefore = Option(new java.io.File(s"$root/data").listFiles())
      .get.map(_.getName).toSet
    spark.sql("DELETE FROM snapd1.t WHERE m = '2024-02'")
    val after = SnapshotStore.current(root).get
    assert(after.entries.map(_.value).toSet === Set("2024-01", "2024-03"))
    // carried BY REFERENCE: identical dir strings, not rewrites
    assert(after.entries.toSet ===
      before.entries.filterNot(_.value == "2024-02").toSet)
    // metadata-only: no new data dir appeared (the id claim is cleaned)
    val dirsAfter = Option(new java.io.File(s"$root/data").listFiles())
      .get.map(_.getName).toSet
    assert(dirsAfter === dirsBefore, "a DELETE must write no data")
    assert(spark.sql("SELECT sum(price) FROM snapd1.t")
      .head().getDouble(0) === 80.0)
    // the dropped month is still on disk and time-travel-visible
    assert(SnapshotStore.read(spark, root, asOf = Some(before.id))
      .count() === 5L)
  }

  test("IN-list and OR predicates translate; AND with a non-partition " +
      "conjunct (or any row-level predicate) is rejected at analysis") {
    val (wh, root) = mkTable("pred")
    register("snapd2", wh)
    spark.sql(
      "DELETE FROM snapd2.t WHERE m IN ('2024-01') OR m = '2024-03'")
    assert(SnapshotStore.current(root).get.entries.map(_.value) ===
      Seq("2024-02"))
    // row-granular predicates cannot be partition drops — loud, with
    // nothing committed
    val before = SnapshotStore.current(root).get.id
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("DELETE FROM snapd2.t WHERE price > 25.0")
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("DELETE FROM snapd2.t WHERE m = '2024-02' AND id = 3")
    }
    assert(SnapshotStore.current(root).get.id === before,
      "a rejected DELETE must not commit")
  }

  test("unconditional DELETE truncates to a typed empty table; the " +
      "history survives for time travel") {
    val (wh, root) = mkTable("trunc")
    register("snapd3", wh)
    val id1 = SnapshotStore.current(root).get.id
    spark.sql("DELETE FROM snapd3.t")
    assert(spark.sql("SELECT count(*) FROM snapd3.t").head().getLong(0) === 0L)
    // schema preserved on the empty table
    assert(spark.table("snapd3.t").columns.toSeq ===
      Seq("id", "m", "v", "price"))
    assert(SnapshotStore.read(spark, root, asOf = Some(id1)).count() === 5L)
    // deleting whole partitions that don't exist is a no-op, not an error
    spark.sql("DELETE FROM snapd3.t WHERE m = '2030-01'")
    assert(spark.sql("SELECT count(*) FROM snapd3.t").head().getLong(0) === 0L)
  }
}
