package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** NESTED-type schema evolution ([[SnapshotStore.addNestedColumns]] /
  * [[SnapshotStore.renameNestedColumns]] /
  * [[SnapshotStore.dropNestedColumns]]): struct subfields join the
  * column-ID model — metadata-only commits, files untouched, reads
  * rebuild structs under logical names where a nested mapping demands
  * it, and a re-ADD of a dropped nested name binds to a fresh
  * physical spelling (no zombie values). Real corpora carry struct
  * metadata columns (source provenance, fetch headers); flat testdata
  * hid this gap until r14. */
class SnapshotNestedEvolveSpec extends SparkSpec {

  import spark.implicits._

  private def mkRoot(tag: String): String = java.nio.file.Files
    .createTempDirectory(s"graft_nested_$tag").toString

  /** docs with a struct `meta(src, score)` column. */
  private def base() = Seq(
    (1L, "2024-01", "cc", 0.9), (2L, "2024-01", "web", 0.5),
    (3L, "2024-02", "cc", 0.7))
    .toDF("id", "m", "src", "score")
    .select(col("id"), col("m"),
      struct(col("src"), col("score")).as("meta"))

  private def metas(df: org.apache.spark.sql.DataFrame)
      : Map[Long, (String, Double)] =
    df.select(col("id"), col("meta.src"), col("meta.score"))
      .as[(Long, String, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap

  test("nested ADD is metadata-only: old files read the new subfield " +
      "as null; new writes carry it; both eras scan together") {
    val root = mkRoot("add")
    SnapshotStore.write(base(), root, "m", "id")
    val dirsBefore = SnapshotStore.current(root).get.entries.map(_.dir)
    SnapshotStore.addNestedColumns(root, Seq(
      Seq("meta") -> StructField("lang", StringType)))
    val m1 = SnapshotStore.current(root).get
    assert(m1.entries.map(_.dir) === dirsBefore, "metadata-only commit")
    // old rows read the subfield as null
    val langs0 = SnapshotStore.read(spark, root)
      .select(col("id"), col("meta.lang")).as[(Long, Option[String])]
      .collect().toMap
    assert(langs0 === Map(1L -> None, 2L -> None, 3L -> None))
    // a new append carries values; one scan unions both file eras
    SnapshotStore.appendPartitions(
      Seq((4L, "2024-02", "cc", 0.8, "en")).toDF(
        "id", "m", "src", "score", "lang")
        .select(col("id"), col("m"),
          struct(col("src"), col("score"), col("lang")).as("meta")),
      root, "m", "id")
    val langs1 = SnapshotStore.read(spark, root)
      .select(col("id"), col("meta.lang")).as[(Long, Option[String])]
      .collect().toMap
    assert(langs1 === Map(1L -> None, 2L -> None, 3L -> None,
      4L -> Some("en")))
  }

  test("nested RENAME is metadata-only: files keep the physical " +
      "spelling, reads rebuild the struct, pre- and post-rename files " +
      "group together; SQL DML through the new name works") {
    val wh = mkRoot("renwh")
    val root = s"$wh/t"
    SnapshotStore.write(base(), root, "m", "id")
    val dirsBefore = SnapshotStore.current(root).get.entries.map(_.dir)
    spark.conf.set("spark.sql.catalog.nest",
      classOf[graft.sources.GraftSnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.nest.warehouse", wh)
    spark.sql("ALTER TABLE nest.t RENAME COLUMN meta.src TO origin")
    assert(SnapshotStore.current(root).get.entries.map(_.dir)
      === dirsBefore, "metadata-only commit")
    // post-rename INSERT writes files that SPELL the frozen physical
    // name; the scan mixes both eras and groups by the new name
    spark.sql("INSERT INTO nest.t SELECT id + 10, m, " +
      "named_struct('origin', 'web', 'score', meta.score + 0.01) " +
      "FROM nest.t WHERE id = 3")
    val grouped = spark.sql(
      "SELECT meta.origin AS o, count(*) AS c FROM nest.t GROUP BY 1")
      .as[(String, Long)].collect().toMap
    assert(grouped === Map("cc" -> 2L, "web" -> 2L),
      "pre- and post-rename files must group by the renamed subfield")
    // Scala read agrees
    assert(SnapshotStore.read(spark, root)
      .filter(col("meta.origin") === "cc").count() === 2L)
    // the rename is invisible to time travel before it
    assert(SnapshotStore.read(spark, root, asOf = Some(1L))
      .select(col("meta.src")).count() === 3L)
    // row-level DML addressing the renamed subfield
    graft.operators.RowLevelOps.deleteRowsCommit(spark, root,
      col("meta.origin") === "web" && col("id") > 10L, "m", "id")
    assert(SnapshotStore.read(spark, root).count() === 3L)
  }

  test("nested DROP retires the physical spelling: a re-ADD of the " +
      "same name binds FRESH — the dropped era's values never " +
      "resurrect") {
    val root = mkRoot("drop")
    SnapshotStore.write(base(), root, "m", "id")
    SnapshotStore.dropNestedColumns(root, Seq(Seq("meta", "src")))
    // the subfield is gone from the read schema
    assert(!SnapshotStore.read(spark, root)
      .select(col("meta.*")).columns.contains("src"))
    // time travel before the drop still sees it
    assert(SnapshotStore.read(spark, root, asOf = Some(1L))
      .select(col("meta.src")).count() === 3L)
    // re-ADD of the SAME name: fresh binding — old values must be NULL
    SnapshotStore.addNestedColumns(root, Seq(
      Seq("meta") -> StructField("src", StringType)))
    val srcs = SnapshotStore.read(spark, root)
      .select(col("id"), col("meta.src")).as[(Long, Option[String])]
      .collect().toMap
    assert(srcs === Map(1L -> None, 2L -> None, 3L -> None),
      "a re-added nested name must NOT resurrect dropped values")
    // and new writes bind to the fresh spelling end to end
    SnapshotStore.appendPartitions(
      Seq((5L, "2024-03", 0.4, "fresh")).toDF("id", "m", "score", "src")
        .select(col("id"), col("m"),
          struct(col("score"), col("src")).as("meta")),
      root, "m", "id")
    val after = SnapshotStore.read(spark, root)
      .filter(col("id") === 5L).select(col("meta.src"))
      .as[String].head()
    assert(after === "fresh")
  }

  test("nested evolution composes with the rest of the engine: CDC " +
      "sidecars respell, compact collapses the mapping, guards refuse " +
      "nonsense paths") {
    val root = mkRoot("comp")
    SnapshotStore.write(base(), root, "m", "id")
    SnapshotStore.renameNestedColumns(root, Seq(
      Seq("meta", "score") -> "quality"))
    // row-level UPDATE on a nested-renamed table: CDC sidecar rows
    // respell physically and read back logically
    val seq0 = SnapshotStore.currentSeq(root)
    graft.operators.RowLevelOps.updateCommit(spark, root,
      col("id") === 1L,
      Seq("meta" -> struct(col("meta.src").as("src"),
        lit(1.0).as("quality"))), "m", "id")
    val feed = SnapshotStore.changeFeed(spark, root, seq0,
      SnapshotStore.currentSeq(root))
      .select(col("_change_type"), col("meta.quality"))
      .as[(String, Double)].collect().toSet
    assert(feed === Set(("update_preimage", 0.9),
      ("update_postimage", 1.0)))
    assert(metas(SnapshotStore.read(spark, root)
      .select(col("id"), col("m"),
        struct(col("meta.src").as("src"),
          col("meta.quality").as("score")).as("meta")))(1L)._2 === 1.0)
    // compact keeps the frozen physical spelling working end to end
    SnapshotStore.compact(spark, root, "m", "id")
    assert(SnapshotStore.read(spark, root)
      .select(col("meta.quality")).count() === 3L)
    // guards: non-struct parent, missing field, last-subfield drop
    intercept[IllegalArgumentException](
      SnapshotStore.addNestedColumns(root, Seq(
        Seq("id") -> StructField("x", StringType))))
    intercept[IllegalArgumentException](
      SnapshotStore.renameNestedColumns(root, Seq(
        Seq("meta", "nope") -> "x")))
    SnapshotStore.dropNestedColumns(root, Seq(Seq("meta", "src")))
    intercept[IllegalArgumentException](
      SnapshotStore.dropNestedColumns(root, Seq(Seq("meta", "quality"))))
  }
}
