package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Column-ID `DROP COLUMN` ([[SnapshotStore.dropColumns]]): a
  * metadata-only commit — the field leaves the manifest schema, every
  * data file keeps its physical column, time travel before the drop
  * still sees it, and the RETIRED registry guarantees a later same-
  * named ADD binds to a FRESH column (fresh id, non-colliding physical
  * spelling) instead of resurrecting the dropped values. */
class SnapshotDropColumnSpec extends SparkSpec {

  import spark.implicits._

  private def mkRoot(tag: String): String = java.nio.file.Files
    .createTempDirectory(s"graft_drop_$tag").toString

  private def register(cat: String, wh: String): Unit = {
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftSnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
  }

  test("drop is metadata-only: dirs carry by reference, reads stop " +
      "projecting the column, time travel before the drop sees it, " +
      "stats keys re-key") {
    val root = mkRoot("meta")
    val df = Seq((1L, "2024-01", 10.0, "a"), (2L, "2024-02", 20.0, "b"))
      .toDF("id", "m", "price", "note")
    SnapshotStore.write(df, root, "m", "id")
    val before = SnapshotStore.current(root).get
    SnapshotStore.dropColumns(root, Seq("note"))
    val after = SnapshotStore.current(root).get
    assert(after.entries.map(_.dir).toSet ===
      before.entries.map(_.dir).toSet,
      "a drop must not rewrite any data dir")
    assert(!SnapshotStore.read(spark, root).columns.contains("note"))
    assert(after.entries.forall(_.stats.forall(!_.cols.contains("note"))),
      "stats of the dropped column leave the manifest")
    // time travel BEFORE the drop still reads the column's values
    val old = SnapshotStore.read(spark, root, asOf = Some(before.id))
      .select("id", "note").as[(Long, String)].collect().toMap
    assert(old === Map(1L -> "a", 2L -> "b"))
    // the retired registry records (id, phys)
    assert(SnapshotStore.retiredFields(after.props).map(_._2) ===
      Seq("note"))
  }

  test("re-ADD of a dropped name binds to a FRESH column: old rows " +
      "read null (no zombie resurrection), new writes land under a " +
      "suffixed physical spelling") {
    val root = mkRoot("readd")
    val df = Seq((1L, "2024-01", "old1"), (2L, "2024-02", "old2"))
      .toDF("id", "m", "note")
    SnapshotStore.write(df, root, "m", "id")
    SnapshotStore.dropColumns(root, Seq("note"))
    SnapshotStore.addColumns(root, Seq(
      org.apache.spark.sql.types.StructField("note",
        org.apache.spark.sql.types.StringType)))
    val m = SnapshotStore.current(root).get
    val f = m.schema.get.fields.find(_.name == "note").get
    assert(f.metadata.getString(SnapshotStore.PhysKey) !== "note",
      "the re-added column must NOT reuse the retained files' spelling")
    // old rows: the fresh physical column is absent from old files →
    // null, never the dropped values
    val got = SnapshotStore.read(spark, root)
      .select(col("id"), col("note")).collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got === Map(1L -> None, 2L -> None))
    // an append WRITES the new column under its fresh physical name
    // and reads it back; the old files still read null beside it
    SnapshotStore.appendPartitions(
      Seq((3L, "2024-02", "fresh")).toDF("id", "m", "note"),
      root, "m", "id")
    val got2 = SnapshotStore.read(spark, root)
      .select(col("id"), col("note")).collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got2 === Map(1L -> None, 2L -> None, 3L -> Some("fresh")))
  }

  test("an APPEND carrying a dropped column's name re-adds it as a " +
      "fresh column too (schema evolution at the commit boundary)") {
    val root = mkRoot("appendreadd")
    SnapshotStore.write(
      Seq((1L, "2024-01", 7.5)).toDF("id", "m", "score"), root, "m", "id")
    SnapshotStore.dropColumns(root, Seq("score"))
    // the appended frame still carries `score` — it evolves back in
    // as a FRESH field; row 1's original 7.5 must stay invisible
    SnapshotStore.appendPartitions(
      Seq((2L, "2024-01", 9.9)).toDF("id", "m", "score"),
      root, "m", "id")
    val got = SnapshotStore.read(spark, root)
      .select(col("id"), col("score")).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got === Map(1L -> None, 2L -> Some(9.9)))
    val f = SnapshotStore.current(root).get.schema.get
      .fields.find(_.name == "score").get
    assert(f.metadata.getString(SnapshotStore.PhysKey) !== "score")
  }

  test("SQL lifecycle: ALTER TABLE DROP COLUMN + re-ADD through the " +
      "catalog; VERSION AS OF before the drop keeps the column") {
    val wh = mkRoot("sqlwh")
    val root = s"$wh/t"
    val df = Seq((1L, "2024-01", 10.0, "x"), (2L, "2024-02", 20.0, "y"))
      .toDF("id", "m", "price", "tagcol")
    SnapshotStore.write(df, root, "m", "id")
    val preId = SnapshotStore.current(root).get.id
    register("dropcat", wh)
    spark.sql("ALTER TABLE dropcat.t DROP COLUMN tagcol")
    assert(!spark.table("dropcat.t").columns.contains("tagcol"))
    spark.sql("ALTER TABLE dropcat.t ADD COLUMN tagcol STRING")
    val vals = spark.sql(
      "SELECT id, tagcol FROM dropcat.t ORDER BY id").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toSeq
    assert(vals === Seq(1L -> None, 2L -> None),
      "the re-added column must read null for pre-drop rows")
    val old = spark.sql(
      s"SELECT id, tagcol FROM dropcat.t VERSION AS OF $preId " +
        "ORDER BY id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSeq
    assert(old === Seq(1L -> "x", 2L -> "y"))
  }

  test("DML and the change feed keep working after a drop") {
    val wh = mkRoot("dmlwh")
    val root = s"$wh/t"
    SnapshotStore.write(
      Seq((1L, "2024-01", 10.0, "x"), (2L, "2024-02", 20.0, "y"))
        .toDF("id", "m", "price", "note"), root, "m", "id")
    register("dropdml", wh)
    val seq0 = SnapshotStore.currentSeq(root)
    spark.sql("ALTER TABLE dropdml.t DROP COLUMN note")
    spark.sql("UPDATE dropdml.t SET price = price + 1.0 WHERE id = 1")
    val got = SnapshotStore.read(spark, root)
      .select(col("id"), col("price")).as[(Long, Double)]
      .collect().toMap
    assert(got === Map(1L -> 11.0, 2L -> 20.0))
    // the feed spans the drop: pre-drop sidecars/diffs read under the
    // TO endpoint's (dropped) schema
    val feed = SnapshotStore.changeFeed(spark, root, seq0,
      SnapshotStore.currentSeq(root))
      .select(col("id"), col("price"), col("_change_type")).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet
    assert(feed === Set((1L, 10.0, "update_preimage"),
      (1L, 11.0, "update_postimage")))
  }

  test("refusals: layout columns, every column, unknown, duplicate; " +
      "a full rewrite clears the retired registry") {
    val root = mkRoot("refuse")
    val df = Seq((1L, "2024-01", 10.0, "a")).toDF("id", "m", "price", "c")
    SnapshotStore.write(df, root, "m", "id")
    def refused(names: Seq[String], needle: String): Unit = {
      val e = intercept[Exception](SnapshotStore.dropColumns(root, names))
      assert(e.getMessage.contains(needle),
        s"expected '$needle' in: ${e.getMessage}")
    }
    refused(Seq("m"), "partition-spec source column")
    refused(Seq("id"), "sort column")
    refused(Seq("price", "c", "nope"), "no such column")
    refused(Seq("c", "C"), "dropped twice")
    SnapshotStore.dropColumns(root, Seq("price", "c"))
    refused(Seq("id", "m"), "cannot drop every column")
    assert(SnapshotStore.retiredFields(
      SnapshotStore.current(root).get.props).size === 2)
    // a full rewrite re-owns every spelling: retired resets and a
    // fresh ADD of the name binds plainly again
    SnapshotStore.write(Seq((1L, "2024-01", 1.0))
      .toDF("id", "m", "price"), root, "m", "id")
    assert(SnapshotStore.retiredFields(
      SnapshotStore.current(root).get.props).isEmpty)
    val f = SnapshotStore.current(root).get.schema.get
      .fields.find(_.name == "price").get
    assert(SnapshotStore.physName(f) === "price")
  }
}
