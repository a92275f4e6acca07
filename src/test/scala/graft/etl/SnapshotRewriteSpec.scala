package graft.etl

import graft.SparkSpec
import graft.operators.RowLevelOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Targeted maintenance ([[SnapshotStore.rewriteDataFiles]], the
  * Iceberg `rewrite_data_files` / Delta `OPTIMIZE` economics): only
  * DIRTY entries (multi-part values, live deletion vectors, outgoing
  * spec vintages, off-target file counts) are restated; everything
  * else carries BY REFERENCE — the property that makes maintenance of
  * a 100 TB table O(dirty data) instead of O(table). */
class SnapshotRewriteSpec extends SparkSpec {

  private def rows(n: Int = 100): DataFrame = {
    import spark.implicits._
    ((1 to n).map(i => (i.toLong, "2024-01",
      java.sql.Timestamp.valueOf(f"2024-01-${i % 28 + 1}%02d 00:00:00"),
      i * 1.0)) ++
      (1 to n).map(i => (100L + i, "2024-02",
        java.sql.Timestamp.valueOf(f"2024-02-${i % 28 + 1}%02d 00:00:00"),
        i * 2.0)))
      .toDF("id", "m", "ts", "price")
  }

  private def tmpRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_rw_$tag").toString

  private def filesIn(root: String, dir: String): Seq[java.io.File] =
    Option(new java.io.File(s"$root/$dir").listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).toSeq

  private def sortedRows(df: DataFrame): Seq[org.apache.spark.sql.Row] =
    df.orderBy("id").collect().toSeq

  test("multi-part fold is TARGETED: the dirty value folds to one " +
      "entry, the clean value's dir carries byte-identically, CDC is " +
      "silent, time travel reads the old layout, and a second call " +
      "is a no-op") {
    import spark.implicits._
    val root = tmpRoot("fold")
    SnapshotStore.write(rows(), root, "m", "ts")
    // February accumulates a second part; January stays clean
    val extra = (1 to 50).map(i => (1000L + i, "2024-02",
      java.sql.Timestamp.valueOf(f"2024-02-${i % 28 + 1}%02d 00:00:00"),
      i * 3.0)).toDF("id", "m", "ts", "price")
    val id2 = SnapshotStore.appendPartitions(extra, root, "m", "ts")
    val pre = SnapshotStore.current(root).get
    assert(pre.entries.count(_.value == "2024-02") === 2)
    val janDirs = pre.entries.filter(_.value == "2024-01").map(_.dir)
    val janFiles = janDirs.flatMap(filesIn(root, _))
      .map(f => (f.getPath, f.length, f.lastModified))
    val before = sortedRows(SnapshotStore.read(spark, root))
    val preSeq = SnapshotStore.history(root).last.seq

    val id3 = SnapshotStore.rewriteDataFiles(spark, root)
    assert(id3 !== id2)
    val m = SnapshotStore.current(root).get
    // January: same dir strings, same files, untouched on disk
    assert(m.entries.filter(_.value == "2024-01").map(_.dir) === janDirs,
      "a clean entry must carry by reference")
    assert(janDirs.flatMap(filesIn(root, _))
      .map(f => (f.getPath, f.length, f.lastModified)) === janFiles,
      "a carried entry's files must be byte-identical on disk")
    // February: folded to exactly one fresh entry
    val feb = m.entries.filter(_.value == "2024-02")
    assert(feb.size === 1)
    assert(feb.head.dir.startsWith(s"data/snap-$id3/"))
    // rows identical before and after
    assert(sortedRows(SnapshotStore.read(spark, root)) === before)
    // the rewrite is dataChange=false: its change feed emits NOTHING
    val postSeq = SnapshotStore.history(root).last.seq
    assert(SnapshotStore.changeFeed(spark, root, preSeq, postSeq)
      .count() === 0L, "a layout-only rewrite must keep the CDC silent")
    // time travel still reads the pre-rewrite layout
    assert(sortedRows(SnapshotStore.read(spark, root, asOf = Some(id2)))
      === before)
    // hysteresis: the freshly rewritten table is clean — no commit
    assert(SnapshotStore.rewriteDataFiles(spark, root) === id3,
      "a second rewrite under the same target must be a no-op")
    assert(SnapshotStore.current(root).get.id === id3)
  }

  test("deletion vectors fold: the rewritten entry drops its vector, " +
      "the reader-era requirement lifts, and live rows are preserved " +
      "exactly") {
    val root = tmpRoot("dv")
    SnapshotStore.write(rows(), root, "m", "ts")
    RowLevelOps.deleteRowsCommit(spark, root,
      col("id") % 10 === 3, "m", "ts")
    val pre = SnapshotStore.current(root).get
    assert(pre.entries.exists(_.dv.isDefined),
      "precondition: the small-fraction delete must route to a DV")
    assert(pre.props.get(SnapshotStore.ReaderVersionProp) === Some("2"))
    val before = sortedRows(SnapshotStore.read(spark, root))

    SnapshotStore.rewriteDataFiles(spark, root)
    val m = SnapshotStore.current(root).get
    assert(m.entries.forall(_.dv.isEmpty), "rewrite must fold vectors")
    // folding the last vector lifts the era requirement
    assert(!m.props.contains(SnapshotStore.ReaderVersionProp))
    assert(sortedRows(SnapshotStore.read(spark, root)) === before)
    assert(SnapshotStore.history(root).last.rows === Some(180L))
  }

  test("binpack split: an oversized entry splits toward the file-size " +
      "target, each file sorted by the table sort column; the result " +
      "is clean under the same target") {
    import spark.implicits._
    val root = tmpRoot("split")
    val big = (1 to 20000).map(i => (i.toLong, "2024-03",
      java.sql.Timestamp.valueOf(
        f"2024-03-${i % 28 + 1}%02d ${i % 24}%02d:00:00"),
      i * 1.5, s"payload-$i-${"x" * 64}"))
      .toDF("id", "m", "ts", "price", "pad")
    SnapshotStore.write(big, root, "m", "ts")
    val e0 = SnapshotStore.current(root).get.entries.head
    val bytes = filesIn(root, e0.dir).map(_.length).sum
    val target = bytes / 4 // ideal ≈ 4-5 files: decisively dirty
    val before = sortedRows(SnapshotStore.read(spark, root))

    val id2 = SnapshotStore.rewriteDataFiles(spark, root,
      targetFileBytes = target)
    val e1 = SnapshotStore.current(root).get.entries.head
    val fs = filesIn(root, e1.dir)
    assert(fs.size >= 2, s"expected a split, got ${fs.size} file(s)")
    assert(sortedRows(SnapshotStore.read(spark, root)) === before)
    // every slice is internally sorted by the table sort column
    fs.foreach { f =>
      val ts = spark.read.parquet(f.getPath)
        .select("ts").collect().map(_.getTimestamp(0).getTime).toSeq
      assert(ts === ts.sorted, s"slice ${f.getName} lost its sort order")
    }
    // and slices are CONTIGUOUS, NON-OVERLAPPING sort runs (range
    // slicing, not hash slicing) — a sort-column probe inside a big
    // partition skips whole files on parquet footer stats
    val ranges = fs.map { f =>
      val r = spark.read.parquet(f.getPath)
        .agg(min("ts"), max("ts")).head()
      (r.getTimestamp(0).getTime, r.getTimestamp(1).getTime)
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, aMax), (bMin, _)) =>
        assert(aMax <= bMin,
          "binpack slices must be non-overlapping sort runs")
      case _ => ()
    }
    // the split result is inside the hysteresis band: no re-rewrite
    assert(SnapshotStore.rewriteDataFiles(spark, root,
      targetFileBytes = target) === id2)
  }

  test("where-selectivity on evolved tables: only the addressed " +
      "old-vintage value migrates to the current layout; the other " +
      "stays stamped and untouched") {
    val root = tmpRoot("mig")
    SnapshotStore.write(rows(), root, "m", "ts")
    SnapshotStore.evolvePartitionSpec(root, "m,bucket(2,id)")
    val pre = SnapshotStore.current(root).get
    assert(pre.entries.forall(_.spec.isDefined))
    val febDirs = pre.entries.filter(_.value == "2024-02").map(_.dir)
    val before = sortedRows(SnapshotStore.read(spark, root))

    SnapshotStore.rewriteDataFiles(spark, root,
      where = _ == "2024-01")
    val m = SnapshotStore.current(root).get
    val jan = m.entries.filter(_.value.startsWith("2024-01"))
    assert(jan.nonEmpty && jan.forall(_.spec.isEmpty),
      "the selected vintage entry must migrate to the current spec")
    assert(jan.forall(_.value.contains("/")),
      "migrated entries must carry the current two-component token")
    assert(m.entries.filter(_.value == "2024-02").map(_.dir) === febDirs,
      "the unselected vintage entry must carry by reference")
    assert(sortedRows(SnapshotStore.read(spark, root)) === before)
  }

  test("SQL procedure: CALL system.rewrite_data_files folds parts and " +
      "returns the committed snapshot id") {
    import spark.implicits._
    val root = tmpRoot("proc")
    SnapshotStore.write(rows(), root, "m", "ts")
    val extra = Seq((5000L, "2024-01",
      java.sql.Timestamp.valueOf("2024-01-05 00:00:00"), 9.0))
      .toDF("id", "m", "ts", "price")
    SnapshotStore.appendPartitions(extra, root, "m", "ts")
    val wh = new java.io.File(root).getParent
    spark.conf.set("spark.sql.catalog.rwproc",
      classOf[graft.sources.GraftSnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.rwproc.warehouse", wh)
    val name = new java.io.File(root).getName
    val rid = spark.sql(
      s"CALL rwproc.system.rewrite_data_files('$name', ${128L * 1024 * 1024})")
      .head().getLong(0)
    val m = SnapshotStore.current(root).get
    assert(m.id === rid)
    assert(m.entries.count(_.value == "2024-01") === 1)
    assert(spark.sql(s"SELECT count(*) AS c FROM rwproc.`$name`")
      .head().getLong(0) === 201L)
  }
}
