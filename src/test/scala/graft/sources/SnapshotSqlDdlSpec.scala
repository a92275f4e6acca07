package graft.sources

import graft.SparkSpec
import graft.etl.SnapshotStore

/** SQL table lifecycle through the catalog: `CREATE TABLE` (empty +
  * CTAS) records the layout as durable manifest props and commits an
  * empty schema-carrying manifest; every DML/ops entry point then
  * works on the created table; `DROP TABLE` removes the root. `ALTER
  * TABLE ADD COLUMN` evolves the schema as a metadata-only commit;
  * other ALTERs and RENAME stay rejected, loudly. */
class SnapshotSqlDdlSpec extends SparkSpec {

  import spark.implicits._

  private def mkWh(tag: String): String = java.nio.file.Files
    .createTempDirectory(s"graft_snapddl_$tag").toString

  private def register(cat: String, wh: String): Unit = {
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[GraftSnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
  }

  test("CREATE TABLE commits an empty schema-carrying manifest with " +
      "the layout as props; INSERT, UPDATE, DELETE and CALL ops all " +
      "work on it; DROP TABLE removes it") {
    val wh = mkWh("create")
    register("snapddl1", wh)
    spark.sql(
      """CREATE TABLE snapddl1.t
        |  (id BIGINT, m STRING, v INT, price DOUBLE)
        |PARTITIONED BY (m)
        |TBLPROPERTIES ('sort_col' = 'v')""".stripMargin)
    // empty but typed, layout recorded
    assert(spark.sql("SELECT * FROM snapddl1.t").columns.toSeq ===
      Seq("id", "m", "v", "price"))
    assert(spark.sql("SELECT count(*) FROM snapddl1.t")
      .head().getLong(0) === 0L)
    val m = SnapshotStore.current(s"$wh/t").get
    assert(SnapshotStore.tableLayout(m) === Some(("m", "v")))
    assert(m.entries.isEmpty)
    // first INSERT appends into the recorded layout
    spark.sql("INSERT INTO snapddl1.t VALUES " +
      "(1, '2024-01', 1, 10.0), (2, '2024-02', 2, 20.0)")
    assert(spark.sql("SELECT sum(price) FROM snapddl1.t")
      .head().getDouble(0) === 30.0)
    // the full DML surface works on a DDL-created table
    spark.sql("UPDATE snapddl1.t SET price = price + 1.0 WHERE id = 1")
    spark.sql("DELETE FROM snapddl1.t WHERE m = '2024-02'")
    assert(spark.sql("SELECT sum(price) FROM snapddl1.t")
      .head().getDouble(0) === 11.0)
    assert(spark.sql("CALL snapddl1.system.history('t')").count() >= 3L)
    // IF NOT EXISTS is a no-op on the existing table; bare CREATE fails
    spark.sql(
      """CREATE TABLE IF NOT EXISTS snapddl1.t (x INT)
        |PARTITIONED BY (x) TBLPROPERTIES ('sort_col' = 'x')"""
        .stripMargin)
    assert(spark.sql("SELECT * FROM snapddl1.t").columns.length === 4)
    intercept[Exception] {
      spark.sql(
        """CREATE TABLE snapddl1.t (x INT)
          |PARTITIONED BY (x) TBLPROPERTIES ('sort_col' = 'x')"""
          .stripMargin)
    }
    // DROP removes the root; the name is free again
    spark.sql("DROP TABLE snapddl1.t")
    assert(!new java.io.File(s"$wh/t").exists())
    intercept[Exception] { spark.sql("SELECT * FROM snapddl1.t") }
  }

  test("CTAS: CREATE TABLE ... AS SELECT creates then appends the " +
      "query through the locked commit path — content and layout both " +
      "land in one statement") {
    val wh = mkWh("ctas")
    register("snapddl2", wh)
    Seq((1L, "2024-01", 1, 10.0), (2L, "2024-01", 2, 20.0),
      (3L, "2024-02", 3, 30.0))
      .toDF("id", "m", "v", "price")
      .createOrReplaceTempView("graft_ddl_src")
    spark.sql(
      """CREATE TABLE snapddl2.t
        |PARTITIONED BY (m)
        |TBLPROPERTIES ('sort_col' = 'v')
        |AS SELECT * FROM graft_ddl_src""".stripMargin)
    assert(spark.sql("SELECT sum(price) FROM snapddl2.t")
      .head().getDouble(0) === 60.0)
    val m = SnapshotStore.current(s"$wh/t").get
    assert(SnapshotStore.tableLayout(m) === Some(("m", "v")))
    assert(m.entries.map(_.value).toSet === Set("2024-01", "2024-02"))
  }

  test("CREATE TABLE refusals are loud and leave nothing behind: " +
      "missing sort_col, unsupported partition transforms, " +
      "partition column absent from the schema; ALTER/RENAME rejected") {
    val wh = mkWh("refuse")
    register("snapddl3", wh)
    val e1 = intercept[Exception] {
      spark.sql("CREATE TABLE snapddl3.a (id BIGINT, m STRING) " +
        "PARTITIONED BY (m)")
    }
    assert(e1.getMessage.contains("sort_col"))
    // identity, bucket, years/months/days/hours and truncate are the
    // supported transforms (multi-column specs have their own spec,
    // SnapshotMultipartSpec); anything else — an unknown transform, a
    // multi-column bucket — refuses loudly
    val e2 = intercept[Exception] {
      spark.sql("CREATE TABLE snapddl3.b (id BIGINT, m STRING) " +
        "PARTITIONED BY (zoom(4, m)) TBLPROPERTIES ('sort_col'='id')")
    }
    assert(e2.getMessage.contains("identity"))
    val e3 = intercept[Exception] {
      spark.sql("CREATE TABLE snapddl3.c (id BIGINT, m STRING) " +
        "PARTITIONED BY (bucket(4, id, m)) TBLPROPERTIES ('sort_col'='id')")
    }
    assert(e3.getMessage.contains("top-level"))
    intercept[Exception] {
      spark.sql("CREATE TABLE snapddl3.d (id BIGINT, m STRING) " +
        "PARTITIONED BY (zz) TBLPROPERTIES ('sort_col'='id')")
    }
    for (n <- Seq("a", "b", "c", "d"))
      assert(!new java.io.File(s"$wh/$n/MANIFEST").exists(),
        s"a refused CREATE must not leave table $n behind")
    // ADD COLUMN is a metadata-only schema-evolution commit; other
    // ALTERs and RENAME stay rejected
    spark.sql("CREATE TABLE snapddl3.t (id BIGINT, m STRING) " +
      "PARTITIONED BY (m) TBLPROPERTIES ('sort_col'='id')")
    spark.sql("INSERT INTO snapddl3.t VALUES (1, '2024-01')")
    val preAlter = SnapshotStore.current(s"$wh/t").get
    spark.sql("ALTER TABLE snapddl3.t ADD COLUMN extra INT")
    assert(spark.sql("SELECT extra FROM snapddl3.t").head().isNullAt(0),
      "existing rows read the added column as null")
    val postAlter = SnapshotStore.current(s"$wh/t").get
    assert(postAlter.entries === preAlter.entries,
      "ADD COLUMN carries every entry by reference (metadata-only)")
    // time travel keeps the pre-alter shape
    assert(!spark.read.format("graft-snapshot")
      .option("asOf", preAlter.id).load(s"$wh/t")
      .columns.contains("extra"))
    // INSERT with the new column works; refusals stay loud
    spark.sql("INSERT INTO snapddl3.t VALUES (2, '2024-02', 7)")
    assert(spark.sql(
      "SELECT sum(coalesce(extra, 0)) FROM snapddl3.t")
      .head().getLong(0) === 7L)
    intercept[Exception] {
      spark.sql("ALTER TABLE snapddl3.t ADD COLUMN extra2 INT NOT NULL")
    }
    intercept[Exception] {
      spark.sql("ALTER TABLE snapddl3.t ADD COLUMN id STRING")
    }
    // placement would be silently ignored (columns always append) —
    // refused instead; a duplicate within one statement refused too
    intercept[Exception] {
      spark.sql("ALTER TABLE snapddl3.t ADD COLUMN z INT FIRST")
    }
    intercept[Exception] {
      spark.sql("ALTER TABLE snapddl3.t ADD COLUMNS (y INT, Y STRING)")
    }
    // a user TBLPROPERTY the manifest cannot persist refuses at CREATE
    val e5 = intercept[Exception] {
      spark.sql("CREATE TABLE snapddl3.p (id BIGINT, m STRING) " +
        "PARTITIONED BY (m) " +
        "TBLPROPERTIES ('sort_col'='id', 'owner_team'='etl')")
    }
    assert(e5.getMessage.contains("owner_team"))
    // case-insensitive layout resolution, normalized to schema casing
    spark.sql("CREATE TABLE snapddl3.ci (id BIGINT, Mn STRING) " +
      "PARTITIONED BY (mn) TBLPROPERTIES ('sort_col'='ID')")
    assert(SnapshotStore.tableLayout(
      SnapshotStore.current(s"$wh/ci").get) === Some(("Mn", "id")))
    // DROP COLUMN is a metadata-only commit now (SnapshotDropColumnSpec
    // pins the column-ID semantics); retype and table RENAME stay
    // rejected
    val preDrop = SnapshotStore.current(s"$wh/t").get
    spark.sql("ALTER TABLE snapddl3.t DROP COLUMN extra")
    assert(!spark.table("snapddl3.t").columns.contains("extra"))
    assert(SnapshotStore.current(s"$wh/t").get.entries.map(_.dir) ===
      preDrop.entries.map(_.dir),
      "DROP COLUMN carries every dir by reference (only the dropped " +
        "column's stats keys leave the entries)")
    intercept[Exception] {
      spark.sql("ALTER TABLE snapddl3.t ALTER COLUMN id TYPE STRING")
    }
    intercept[Exception] {
      spark.sql("ALTER TABLE snapddl3.t RENAME TO t2")
    }
    // dropping a nonexistent table is false, not an error, under
    // IF EXISTS; bare DROP of a missing table errors
    spark.sql("DROP TABLE IF EXISTS snapddl3.nope")
    intercept[Exception] { spark.sql("DROP TABLE snapddl3.nope") }
  }
}
