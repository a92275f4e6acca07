package graft.plans

import graft.SparkSpec
import graft.etl.SnapshotStore
import graft.operators.RowLevelOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** Metadata-only aggregates ([[SnapshotMetadataOnlyAgg]]): whole-table
  * COUNT(*)/MIN/MAX answered from manifest stats with ZERO data-file
  * scans — and every disqualifying shape falling back to the scan with
  * identical results (the A/B the rule's correctness rests on). */
class SnapshotMetadataAggSpec extends SparkSpec {

  private def rows(n: Int = 100): DataFrame = {
    import spark.implicits._
    ((1 to n).map(i => (i.toLong, "2024-01",
      java.sql.Date.valueOf(f"2024-01-${i % 28 + 1}%02d"),
      i * 1.5, if (i % 3 == 0) null else s"c$i%03d")) ++
      (1 to n).map(i => (100L + i, "2024-02",
        java.sql.Date.valueOf(f"2024-02-${i % 28 + 1}%02d"),
        i * 2.5, s"d$i%03d")))
      .toDF("id", "m", "d", "price", "tag")
  }

  private def tmpRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_magg_$tag").toString

  private def register(root: String): String = {
    val f = new java.io.File(root)
    spark.conf.set("spark.sql.catalog.graftmagg",
      classOf[graft.sources.GraftSnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftmagg.warehouse", f.getParent)
    s"graftmagg.`${f.getName}`"
  }

  /** AQE wraps the plan in an [[AdaptiveSparkPlanExec]] with NO
    * children — a naive collect on it finds nothing and every scan
    * assertion passes vacuously. Unwrap first. */
  private def stripAqe(p: org.apache.spark.sql.execution.SparkPlan)
      : org.apache.spark.sql.execution.SparkPlan = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      a.executedPlan
    case other => other
  }

  private def scansIn(df: DataFrame): Int =
    stripAqe(df.queryExecution.executedPlan).collect {
      case b: BatchScanExec => b
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.size

  /** Run `sql` twice — rule on and off — assert the ON plan is
    * scan-free, the OFF plan scans, and both return identical rows. */
  private def assertMetadataAnswered(sql: String): Unit = {
    val on = spark.sql(sql)
    assert(scansIn(on) === 0,
      s"expected a metadata-only plan for [$sql], got:\n" +
        on.queryExecution.executedPlan)
    val onRows = on.collect().toSeq.sortBy(_.toString)
    spark.conf.set("spark.graft.agg.metadataOnly", "false")
    try {
      val off = spark.sql(sql)
      assert(scansIn(off) > 0, "A/B control: the OFF plan must scan")
      assert(onRows === off.collect().toSeq.sortBy(_.toString),
        s"metadata answer diverged from the scan for [$sql]")
    } finally spark.conf.set("spark.graft.agg.metadataOnly", "true")
  }

  private def assertScanAnswered(sql: String): DataFrame = {
    val df = spark.sql(sql)
    assert(scansIn(df) > 0,
      s"expected a scan fallback for [$sql], got:\n" +
        df.queryExecution.executedPlan)
    df
  }

  test("COUNT(*)/MIN/MAX on a clean table: zero scans, values match " +
      "the scan plan exactly (long, double, string, date columns)") {
    val root = tmpRoot("clean")
    SnapshotStore.write(rows(), root, "m", "d")
    val t = register(root)
    assertMetadataAnswered(
      s"SELECT count(*) AS cnt, min(id) AS mn_id, max(id) AS mx_id, " +
        s"min(price) AS mn_p, max(price) AS mx_p, " +
        s"min(d) AS mn_d, max(d) AS mx_d, max(m) AS mx_m FROM $t")
    // aggregates embedded in larger expressions fold too
    assertMetadataAnswered(
      s"SELECT count(*) * 2 AS c2, max(id) - min(id) AS spread FROM $t")
  }

  test("COUNT(*) stays metadata-only and EXACT on a DV-bearing table; " +
      "MIN/MAX falls back to the (DV-applied) scan") {
    val root = tmpRoot("dv")
    SnapshotStore.write(rows(), root, "m", "d")
    RowLevelOps.deleteRowsCommit(spark, root,
      col("id") % 10 === 3, "m", "d")
    require(SnapshotStore.current(root).get.entries.exists(_.dv.isDefined),
      "precondition: the delete must route merge-on-read")
    val t = register(root)
    assertMetadataAnswered(s"SELECT count(*) AS cnt FROM $t")
    // 200 rows - 20 deleted (ids ≡3 mod 10 in both halves)
    assert(spark.sql(s"SELECT count(*) AS cnt FROM $t").head.getLong(0)
      === 180L)
    // a vector may hold the extremal row: min/max must scan
    val mm = assertScanAnswered(
      s"SELECT min(id) AS mn, max(id) AS mx FROM $t")
    assert(mm.head.getLong(0) === 1L && mm.head.getLong(1) === 200L)
  }

  test("renamed column: MIN/MAX resolves through the logical→physical " +
      "map; widened int→long column still answers") {
    val root = tmpRoot("ddl")
    SnapshotStore.write(rows(), root, "m", "d")
    SnapshotStore.renameColumns(root, Seq("price" -> "amount"))
    val t = register(root)
    assertMetadataAnswered(
      s"SELECT min(amount) AS mn, max(amount) AS mx FROM $t")
  }

  test("disqualifying shapes fall back to the scan: WHERE, GROUP BY, " +
      "count(col), count(DISTINCT), FILTER clause") {
    val root = tmpRoot("fb")
    SnapshotStore.write(rows(), root, "m", "d")
    val t = register(root)
    assertScanAnswered(s"SELECT count(*) AS c FROM $t WHERE id > 5")
    // grouping by a NON-identity (data) column cannot attribute
    // entries to groups (GROUP BY the partition column m is
    // metadata-answered — pinned in the grouped test below)
    assertScanAnswered(s"SELECT d, count(*) AS c FROM $t GROUP BY d")
    assertScanAnswered(s"SELECT count(tag) AS c FROM $t")
    assertScanAnswered(s"SELECT count(DISTINCT id) AS c FROM $t")
    assertScanAnswered(
      s"SELECT count(*) FILTER (WHERE id > 5) AS c FROM $t")
    // tag is partly null per partition — stats exist (non-null chunks
    // contribute), so min/max DOES answer; but a column absent from
    // stats in any rows>0 entry would scan. Pin the positive case:
    assertMetadataAnswered(
      s"SELECT min(tag) AS mn, max(tag) AS mx FROM $t")
  }

  test("time travel pins the answering manifest: VERSION AS OF counts " +
      "differ across a DELETE, both scan-free") {
    val root = tmpRoot("tt")
    val v1 = SnapshotStore.write(rows(), root, "m", "d")
    RowLevelOps.deleteRowsCommit(spark, root,
      col("id") % 10 === 7, "m", "d")
    val t = register(root)
    val now = spark.sql(s"SELECT count(*) AS c FROM $t")
    val old = spark.sql(s"SELECT count(*) AS c FROM $t VERSION AS OF $v1")
    assert(scansIn(now) === 0 && scansIn(old) === 0)
    assert(old.head.getLong(0) === 200L)
    assert(now.head.getLong(0) === 180L)
  }

  test("GROUP BY the identity partition column: per-partition " +
      "COUNT/MIN/MAX from stats, zero scans; non-identity grouping " +
      "falls back; DV-bearing grouped count stays exact") {
    val root = tmpRoot("grp")
    SnapshotStore.write(rows(), root, "m", "d")
    val t = register(root)
    assertMetadataAnswered(
      s"SELECT m, count(*) AS cnt, min(id) AS mn_id, " +
        s"max(price) AS mx_p FROM $t GROUP BY m")
    // expression-of-aggregate + group key in expressions folds too
    assertMetadataAnswered(
      s"SELECT concat(m, '!') AS tag, count(*) * 2 AS c2 " +
        s"FROM $t GROUP BY m")
    // a non-identity (data) column can't attribute entries to groups
    assertScanAnswered(s"SELECT tag, count(*) AS c FROM $t GROUP BY tag")
    // merge-on-read: grouped count remains exact (per-entry live rows
    // belong wholly to the entry's group), min/max falls back
    val rootDv = tmpRoot("grpdv")
    SnapshotStore.write(rows(), rootDv, "m", "d")
    RowLevelOps.deleteRowsCommit(spark, rootDv,
      col("id") % 10 === 3, "m", "d")
    val tDv = register(rootDv)
    val grouped = spark.sql(
      s"SELECT m, count(*) AS cnt FROM $tDv GROUP BY m ORDER BY m")
    assert(scansIn(grouped) === 0)
    assert(grouped.collect().map(r => (r.getString(0), r.getLong(1)))
      .toSeq === Seq(("2024-01", 90L), ("2024-02", 90L)))
    assertScanAnswered(
      s"SELECT m, min(id) AS mn FROM $tDv GROUP BY m")
  }

  test("WHERE clauses decided per entry answer without a scan: " +
      "partition equality/range/IN/NOT, impossible ranges; straddling " +
      "predicates fall back; DV count stays exact under the filter") {
    val root = tmpRoot("where")
    SnapshotStore.write(rows(), root, "m", "d")
    val t = register(root)
    assertMetadataAnswered(
      s"SELECT count(*) AS cnt FROM $t WHERE m = '2024-01'")
    assertMetadataAnswered(
      s"SELECT count(*) AS cnt, min(id) AS mn FROM $t WHERE m >= '2024-02'")
    assertMetadataAnswered(
      s"SELECT count(*) AS cnt FROM $t WHERE m IN ('2024-01', 'nope')")
    assertMetadataAnswered(
      s"SELECT count(*) AS cnt FROM $t WHERE m <> '2024-01'")
    // no entry can match: every entry decides FALSE via the range
    // pruner — count 0, min NULL, still scan-free
    assertMetadataAnswered(
      s"SELECT count(*) AS cnt, min(id) AS mn FROM $t WHERE id > 99999")
    assert(spark.sql(
      s"SELECT count(*) AS cnt FROM $t WHERE m = '2024-01'")
      .head.getLong(0) === 100L)
    // grouped + WHERE composes
    assertMetadataAnswered(
      s"SELECT m, count(*) AS c FROM $t WHERE m <> '2024-01' GROUP BY m")
    // a predicate some entry STRADDLES must scan
    assertScanAnswered(s"SELECT count(*) AS c FROM $t WHERE id > 5")
    // merge-on-read + filter: live rows of the selected entry only
    val rootDv = tmpRoot("wheredv")
    SnapshotStore.write(rows(), rootDv, "m", "d")
    RowLevelOps.deleteRowsCommit(spark, rootDv,
      col("id") % 10 === 3, "m", "d")
    val tDv = register(rootDv)
    val c = spark.sql(
      s"SELECT count(*) AS cnt FROM $tDv WHERE m = '2024-01'")
    assert(scansIn(c) === 0)
    assert(c.head.getLong(0) === 90L)
  }

  test("compact() preserves the metadata answers byte-for-byte; a " +
      "branch read answers from the BRANCH head while main stays put") {
    import org.apache.spark.sql.functions.{count, lit}
    val root = tmpRoot("cmp")
    SnapshotStore.write(rows(), root, "m", "d")
    val t = register(root)
    val sql = s"SELECT count(*) AS cnt, min(id) AS mn, max(price) AS mx" +
      s" FROM $t"
    val before = spark.sql(sql).collect().toSeq
    SnapshotStore.compact(spark, root, "m", "d")
    assertMetadataAnswered(sql)
    assert(spark.sql(sql).collect().toSeq === before,
      "compact changed a metadata-answered aggregate")
    // write-audit-publish: the staged branch commit answers on the
    // branch, never on main
    import spark.implicits._
    SnapshotStore.branch(root, "audit")
    SnapshotStore.appendToBranch(
      Seq((9999L, "2024-03", java.sql.Date.valueOf("2024-03-01"),
        1.0, "x")).toDF("id", "m", "d", "price", "tag"),
      root, "audit")
    val branchCnt = spark.read.format("graft-snapshot")
      .option("branch", "audit").load(root)
      .agg(count(lit(1)).as("cnt"))
    assert(scansIn(branchCnt) === 0)
    assert(branchCnt.head.getLong(0) === 201L)
    assert(spark.sql(s"SELECT count(*) AS c FROM $t").head.getLong(0)
      === 200L, "main must not see the staged branch commit")
  }

  test("scalar subquery aggregate is answered from metadata inside a " +
      "bigger query") {
    val root = tmpRoot("subq")
    SnapshotStore.write(rows(), root, "m", "d")
    val t = register(root)
    val df = spark.sql(
      s"SELECT id FROM $t WHERE id = (SELECT max(id) FROM $t)")
    // the rewrite happens at analysis: the subquery's relation is
    // GONE from the analyzed plan (folded to a literal), the outer
    // relation stays — exactly one snapshot relation remains
    val rels = df.queryExecution.analyzed.collectWithSubqueries {
      case r: org.apache.spark.sql.execution.datasources.v2
          .DataSourceV2Relation => r
    }
    assert(rels.size === 1,
      s"subquery max() should fold to a literal:\n" +
        df.queryExecution.analyzed)
    assert(df.collect().map(_.getLong(0)).toSeq === Seq(200L))
  }
}
