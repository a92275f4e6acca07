package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Type WIDENING ([[SnapshotStore.widenColumnTypes]]): a metadata-only
  * commit moves a column up the promotion lattice (byte→short→int→
  * long, float→double); old files stay as written and up-cast at scan
  * time, new writes land wide, time travel keeps the narrow shape,
  * and everything unsafe (narrowing, cross-family, layout columns)
  * refuses loudly. */
class SnapshotTypeWidenSpec extends SparkSpec {

  import spark.implicits._

  private def mkRoot(tag: String): String = java.nio.file.Files
    .createTempDirectory(s"graft_widen_$tag").toString

  test("int→long widen is metadata-only: old int32 files read as " +
      "long, appends land wide, mixed files scan together, time " +
      "travel keeps the narrow shape, integral stats carry") {
    val root = mkRoot("intlong")
    val df = Seq((1L, "2024-01", 10), (2L, "2024-02", 20))
      .toDF("id", "m", "v") // v: IntegerType
    SnapshotStore.write(df, root, "m", "id")
    val before = SnapshotStore.current(root).get
    SnapshotStore.widenColumnTypes(root, Seq("v" -> LongType))
    val m1 = SnapshotStore.current(root).get
    assert(m1.entries.map(_.dir).toSet === before.entries.map(_.dir).toSet,
      "widening must not rewrite any data dir")
    assert(m1.schema.get("v").dataType === LongType)
    assert(m1.entries.forall(_.stats.exists(_.cols.contains("v"))),
      "integral stats carry through the widen")
    // old int32 files up-cast at scan time
    val got = SnapshotStore.read(spark, root)
      .select(col("id"), col("v")).as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 10L, 2L -> 20L))
    // appends land wide; mixed int32/int64 files scan together
    SnapshotStore.appendPartitions(
      Seq((3L, "2024-02", 5000000000L)).toDF("id", "m", "v"),
      root, "m", "id")
    val got2 = SnapshotStore.read(spark, root)
      .select(col("id"), col("v")).as[(Long, Long)].collect().toMap
    assert(got2 === Map(1L -> 10L, 2L -> 20L, 3L -> 5000000000L))
    // time travel BEFORE the widen keeps the narrow type
    assert(SnapshotStore.read(spark, root, asOf = Some(before.id))
      .schema("v").dataType === IntegerType)
    // row-level DML over the mixed files stays exact
    graft.operators.RowLevelOps.updateCommit(spark, root,
      cond = col("id") === 1L, sets = Seq("v" -> lit(11L)), "m", "id")
    assert(SnapshotStore.read(spark, root).filter(col("id") === 1L)
      .select(col("v")).as[Long].head() === 11L)
  }

  test("float→double widen drops the column's stats (float-rendered " +
      "strings parse to different doubles — pruning must not trust " +
      "them) and reads old float files as double") {
    val root = mkRoot("fd")
    val df = Seq((1L, "2024-01", 0.1f), (2L, "2024-02", 2.5f))
      .toDF("id", "m", "score")
    SnapshotStore.write(df, root, "m", "id")
    assert(SnapshotStore.current(root).get.entries
      .forall(_.stats.exists(_.cols.contains("score"))))
    SnapshotStore.widenColumnTypes(root, Seq("score" -> DoubleType))
    val m1 = SnapshotStore.current(root).get
    assert(m1.schema.get("score").dataType === DoubleType)
    assert(m1.entries.forall(_.stats.forall(!_.cols.contains("score"))),
      "float stats must not survive the widen")
    val got = SnapshotStore.read(spark, root)
      .select(col("id"), col("score")).as[(Long, Double)].collect().toMap
    // IEEE float→double is exact: the doubles are the widened floats
    assert(got === Map(1L -> 0.1f.toDouble, 2L -> 2.5f.toDouble))
  }

  test("SQL surface: ALTER TABLE ALTER COLUMN TYPE through the " +
      "catalog; refusals: narrowing, cross-family, layout columns") {
    val wh = mkRoot("sqlwh")
    val root = s"$wh/t"
    SnapshotStore.write(Seq((1L, "2024-01", 7, 1.5f))
      .toDF("id", "m", "v", "s"), root, "m", "id")
    spark.conf.set("spark.sql.catalog.widencat",
      classOf[graft.sources.GraftSnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.widencat.warehouse", wh)
    spark.sql("ALTER TABLE widencat.t ALTER COLUMN v TYPE BIGINT")
    assert(spark.table("widencat.t").schema("v").dataType === LongType)
    assert(spark.sql("SELECT sum(v) FROM widencat.t").head().getLong(0)
      === 7L)
    def refused(sql: String, needle: String): Unit = {
      val e = intercept[Exception](spark.sql(sql))
      assert(e.getMessage.contains(needle),
        s"expected '$needle' in: ${e.getMessage}")
    }
    // narrowing dies in Spark's OWN analyzer gate (canUpCast) before
    // reaching the catalog — loud either way
    refused("ALTER TABLE widencat.t ALTER COLUMN v TYPE INT",
      "NOT_SUPPORTED_CHANGE_COLUMN")
    // float→string passes Spark's canUpCast but is NOT a parquet
    // read-compatible widening — OUR gate refuses it
    refused("ALTER TABLE widencat.t ALTER COLUMN s TYPE STRING",
      "read-compatible widenings")
    val e = intercept[Exception](
      SnapshotStore.widenColumnTypes(root, Seq("m" -> StringType)))
    assert(e.getMessage.contains("read-compatible") ||
      e.getMessage.contains("partition-spec"))
  }

  test("layout columns refuse: a bucket source's hash and a float " +
      "token's rendering would silently unmatch the written tokens") {
    val root = mkRoot("layout")
    SnapshotStore.write(Seq((1, "2024-01", 1.0)).toDF("id", "m", "p"),
      root, "m,bucket(2,id)", "m")
    val e = intercept[Exception](
      SnapshotStore.widenColumnTypes(root, Seq("id" -> LongType)))
    assert(e.getMessage.contains("partition-spec source"))
  }
}
