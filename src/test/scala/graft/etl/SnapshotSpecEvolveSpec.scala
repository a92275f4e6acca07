package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Partition-spec EVOLUTION ([[SnapshotStore.evolvePartitionSpec]]):
  * a metadata-only commit moves the table's layout for FUTURE commits;
  * existing entries keep (and record) their outgoing spec, readers
  * union vintages, and EVERY write path spans vintages (since r14):
  * row-level DML and MERGE discover touched entries by FILE identity
  * and migrate what they restate; dynamic overwrite resolves its
  * addressed values inside old-vintage entries and migrates their
  * survivors; compact migrates everything at once. */
class SnapshotSpecEvolveSpec extends SparkSpec {

  import spark.implicits._

  private def mkRoot(tag: String): String = java.nio.file.Files
    .createTempDirectory(s"graft_evolve_$tag").toString

  private def base() = Seq(
    (1L, "2024-01", 10.0), (2L, "2024-01", 20.0),
    (3L, "2024-02", 30.0), (4L, "2024-02", 40.0))
    .toDF("id", "m", "price")

  private def register(cat: String, wh: String): Unit = {
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftSnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
  }

  test("evolve is metadata-only: entries stamped with the outgoing " +
      "spec, dirs carried by reference; appends land under the NEW " +
      "spec; reads union vintages") {
    val root = mkRoot("meta")
    SnapshotStore.write(base(), root, "m", "id")
    val before = SnapshotStore.current(root).get
    SnapshotStore.evolvePartitionSpec(root, "m,bucket(2,id)")
    val m1 = SnapshotStore.current(root).get
    assert(SnapshotStore.tableLayout(m1) === Some(("m,bucket(2,id)", "id")))
    assert(m1.entries.map(_.dir).toSet === before.entries.map(_.dir).toSet,
      "evolution must not rewrite any data dir")
    assert(m1.entries.forall(_.spec.contains("m")),
      "existing entries record the OUTGOING spec")
    // an append commits under the new spec (composite tokens)
    SnapshotStore.appendPartitions(
      Seq((5L, "2024-03", 50.0)).toDF("id", "m", "price"),
      root, "m,bucket(2,id)", "id")
    val m2 = SnapshotStore.current(root).get
    val freshEntries = m2.entries.filterNot(e =>
      before.entries.map(_.dir).contains(e.dir))
    assert(freshEntries.nonEmpty && freshEntries.forall(_.spec.isEmpty),
      "fresh entries are current-spec (unstamped)")
    assert(freshEntries.forall(_.value.startsWith("2024-03/")),
      s"fresh entries carry composite tokens: ${freshEntries.map(_.value)}")
    // reads union both vintages
    assert(SnapshotStore.read(spark, root).count() === 5L)
  }

  test("row-level UPDATE and DELETE span vintages and MIGRATE the " +
      "touched old entries to the current spec") {
    val root = mkRoot("dml")
    SnapshotStore.write(base(), root, "m", "id")
    SnapshotStore.evolvePartitionSpec(root, "m,bucket(2,id)")
    SnapshotStore.appendPartitions(
      Seq((5L, "2024-01", 50.0)).toDF("id", "m", "price"),
      root, "m,bucket(2,id)", "id")
    // UPDATE touches a row in the OLD '2024-01' entry AND the new
    // bucketed one (ids 1 and 5 both live in month 2024-01)
    graft.operators.RowLevelOps.updateCommit(spark, root,
      cond = col("id").isin(1L, 5L),
      sets = Seq("price" -> (col("price") + lit(1.0))),
      "m,bucket(2,id)", "id")
    val got = SnapshotStore.read(spark, root)
      .select(col("id"), col("price")).as[(Long, Double)].collect().toMap
    assert(got === Map(1L -> 11.0, 2L -> 20.0, 3L -> 30.0,
      4L -> 40.0, 5L -> 51.0))
    val m1 = SnapshotStore.current(root).get
    // the touched old '2024-01' entry migrated: no old-vintage entry
    // for 2024-01 remains; 2024-02 (untouched) still carries old-spec
    assert(!m1.entries.exists(e =>
      e.spec.isDefined && e.value == "2024-01"),
      "the touched old-vintage entry must migrate")
    assert(m1.entries.exists(e =>
      e.spec.contains("m") && e.value == "2024-02"),
      "untouched old-vintage entries carry by reference")
    // DELETE id 2 (old 2024-01 vintage is gone; id 2 now lives in a
    // migrated current-spec entry) and id 3 (old 2024-02 vintage)
    graft.operators.RowLevelOps.deleteRowsCommit(spark, root,
      cond = col("id").isin(2L, 3L), "m,bucket(2,id)", "id")
    assert(SnapshotStore.read(spark, root)
      .select(col("id")).as[Long].collect().toSet === Set(1L, 4L, 5L))
    assert(!SnapshotStore.current(root).get.entries.exists(e =>
      e.spec.isDefined && e.value == "2024-02"),
      "the touched 2024-02 vintage migrated with the delete")
  }

  test("partition-granular SQL DELETE stays exact across vintages " +
      "(per-entry spec decisions); MERGE spans vintages WITHOUT a " +
      "prior compact and migrates the entries it touches") {
    val wh = mkRoot("sqlwh")
    val root = s"$wh/t"
    SnapshotStore.write(base(), root, "m", "id")
    SnapshotStore.evolvePartitionSpec(root, "m,bucket(2,id)")
    SnapshotStore.appendPartitions(
      Seq((6L, "2024-03", 60.0)).toDF("id", "m", "price"),
      root, "m,bucket(2,id)", "id")
    register("evo", wh)
    // metadata-only drop of an OLD-vintage month: decided under the
    // entry's own spec, no data written
    spark.sql("DELETE FROM evo.t WHERE m = '2024-01'")
    val m1 = SnapshotStore.current(root).get
    assert(SnapshotStore.read(spark, root)
      .select(col("id")).as[Long].collect().toSet === Set(3L, 4L, 6L))
    assert(java.nio.file.Files.list(
      java.nio.file.Paths.get(s"$root/data/snap-${m1.id}")).count() === 0L,
      "the cross-vintage partition drop must stay metadata-only")
    // MERGE on the mixed-spec table: id 3 lives in an OLD-vintage
    // 2024-02 entry — the file-attributed discovery finds it, the
    // restatement migrates the touched entry to the current layout
    Seq((3L, "2024-02", 1.0, false)).toDF("id", "m", "price", "del")
      .createOrReplaceTempView("evo_changes")
    spark.sql("CALL evo.system.merge_into('t', 'evo_changes', 'id', 'del')")
    val afterMerge = SnapshotStore.read(spark, root)
      .select(col("id"), col("price")).as[(Long, Double)].collect().toMap
    assert(afterMerge === Map(3L -> 1.0, 4L -> 40.0, 6L -> 60.0))
    assert(!SnapshotStore.current(root).get.entries.exists(e =>
      e.spec.isDefined && e.value == "2024-02"),
      "the MERGE-touched old-vintage entry must migrate to the " +
        "current layout")
    // compact still migrates everything that remains
    SnapshotStore.compact(spark, root, "m,bucket(2,id)", "id")
    assert(SnapshotStore.current(root).get.entries.forall(_.spec.isEmpty))
  }

  test("dynamic overwrite spans vintages: the addressed value is " +
      "replaced inside old-vintage entries too, and their survivors " +
      "migrate to the current layout") {
    val root = mkRoot("ow")
    // BUCKET-only first, THEN evolved to month identity: every
    // old-vintage bucket entry MIXES months, so a value-addressed
    // month overwrite must reach inside them AND migrate the other
    // months' rows (the survivors) to the current layout
    val id1 = SnapshotStore.write(base(), root, "bucket(2,id)", "id")
    SnapshotStore.evolvePartitionSpec(root, "m", Some("id"))
    SnapshotStore.overwritePartitions(
      Seq((9L, "2024-02", 9.0)).toDF("id", "m", "price"), root, "m", "id")
    val got = SnapshotStore.read(spark, root)
      .select(col("id"), col("price")).as[(Long, Double)].collect().toMap
    assert(got === Map(1L -> 10.0, 2L -> 20.0, 9L -> 9.0),
      "old-vintage 2024-02 rows (ids 3,4) must be REPLACED by the " +
        "overwrite, surviving 2024-01 rows preserved exactly once")
    val m2 = SnapshotStore.current(root).get
    // the affected buckets dropped; their 2024-01 survivors live in
    // CURRENT-spec month entries now (migration), and the overwritten
    // month is a fresh current-spec entry
    assert(m2.entries.filter(_.spec.isEmpty).map(_.value)
      .contains("2024-02"))
    assert(SnapshotStore.read(spark, root)
      .filter(col("m") === "2024-01").count() === 2L)
    // time travel to the pre-overwrite state still sees all 4 rows
    assert(SnapshotStore.read(spark, root, asOf = Some(id1))
      .count() === 4L)
  }

  test("schema DDL honors OUTGOING-vintage specs: dropping/widening a " +
      "column an old vintage still keys refuses; RENAME re-keys the " +
      "stamped specs so spec-aware DML keeps working") {
    val root = mkRoot("ddl")
    SnapshotStore.write(
      Seq((1, "2024-01", 10.0), (2, "2024-02", 20.0))
        .toDF("id", "m", "price"), root, "bucket(2,id)", "m")
    SnapshotStore.evolvePartitionSpec(root, "m", Some("m"))
    // 'id' left the CURRENT spec but still keys the stamped entries —
    // dropping or widening it would break their token addressing
    val e1 = intercept[Exception](
      SnapshotStore.dropColumns(root, Seq("id")))
    assert(e1.getMessage.contains("outgoing vintage"))
    val e2 = intercept[Exception](SnapshotStore.widenColumnTypes(root,
      Seq("id" -> org.apache.spark.sql.types.LongType)))
    assert(e2.getMessage.contains("outgoing vintage"))
    // a rename of a stamped spec's source column re-keys the stamp;
    // spec-aware row-level DML then discovers under the NEW name
    SnapshotStore.renameColumns(root, Seq("id" -> "key"))
    assert(SnapshotStore.current(root).get.entries
      .forall(_.spec.contains("bucket(2,key)")),
      "the stamped outgoing spec must follow the rename")
    graft.operators.RowLevelOps.updateCommit(spark, root,
      cond = col("key") === 1,
      sets = Seq("price" -> lit(11.0)), "m", "m")
    val got = SnapshotStore.read(spark, root)
      .select(col("key"), col("price")).as[(Int, Double)]
      .collect().toMap
    assert(got === Map(1 -> 11.0, 2 -> 20.0))
  }

  test("a SORT-ONLY evolution does not stamp entries into mixed-spec " +
      "mode: MERGE keeps working") {
    val wh = mkRoot("sortonly")
    val root = s"$wh/t"
    SnapshotStore.write(base(), root, "m", "id")
    SnapshotStore.evolvePartitionSpec(root, "m", Some("price"))
    val m1 = SnapshotStore.current(root).get
    assert(SnapshotStore.tableLayout(m1) === Some(("m", "price")))
    assert(m1.entries.forall(_.spec.isEmpty),
      "same partition spec — no entry may be stamped as outgoing")
    register("evosort", wh)
    Seq((1L, "2024-01", 99.0, false)).toDF("id", "m", "price", "del")
      .createOrReplaceTempView("evosort_changes")
    spark.sql(
      "CALL evosort.system.merge_into('t', 'evosort_changes', 'id', 'del')")
    assert(SnapshotStore.read(spark, root)
      .filter(col("id") === 1L).select(col("price"))
      .as[Double].head() === 99.0)
  }

  test("SQL surface: CALL system.evolve_spec; refusals: same layout, " +
      "unknown column, bad transform") {
    val wh = mkRoot("callwh")
    val root = s"$wh/t"
    SnapshotStore.write(base(), root, "m", "id")
    register("evo2", wh)
    spark.sql("CALL evo2.system.evolve_spec('t', 'm,bucket(2,id)')")
    assert(SnapshotStore.tableLayout(SnapshotStore.current(root).get)
      === Some(("m,bucket(2,id)", "id")))
    val e1 = intercept[Exception](
      SnapshotStore.evolvePartitionSpec(root, "m, bucket( 2 , id )"))
    assert(e1.getMessage.contains("nothing to evolve"))
    intercept[Exception](
      SnapshotStore.evolvePartitionSpec(root, "nope"))
    intercept[Exception](
      SnapshotStore.evolvePartitionSpec(root, "zoom(4,m)"))
  }
}
