package graft.etl

import graft.SparkSpec
import graft.operators.RowLevelOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Merge-on-read row-level DML: deletion vectors. Pins the r14
  * contract — a small-fraction DELETE/UPDATE commits O(positions), not
  * O(partition); every read path anti-applies vectors; copy-on-write
  * remains the high-fraction fallback; compaction folds vectors and
  * lifts the reader-era requirement; retention pins sidecars. */
class SnapshotDeletionVectorSpec extends SparkSpec {

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
    java.nio.file.Files.createTempDirectory(s"graft_dv_$tag").toString

  private def dataDirsOf(root: String, snapId: Long): Seq[String] =
    Option(new java.io.File(s"$root/data/snap-$snapId").listFiles())
      .getOrElse(Array.empty).map(_.getName)
      .filter(_.startsWith("__part=")).toSeq.sorted

  test("small-fraction DELETE commits a deletion vector: no partition " +
      "restated, reads correct on every path, time travel unaffected") {
    val root = tmpRoot("del")
    val id1 = SnapshotStore.write(rows(), root, "m", "ts")
    val id2 = RowLevelOps.deleteRowsCommit(spark, root,
      col("id") % 10 === 3, "m", "ts")
    assert(id2 !== id1)
    // the commit wrote NO data dirs — only the vector + CDC sidecars
    assert(dataDirsOf(root, id2).isEmpty,
      "a DV delete must not restate any partition")
    assert(new java.io.File(s"$root/data/snap-$id2/_dv").isDirectory)
    // manifest: both hit entries carry a 10-position vector; the
    // reader-era prop is stamped
    val m = SnapshotStore.current(root).get
    assert(m.entries.forall(_.dv.exists(_.rows === 10L)))
    assert(m.props.get(SnapshotStore.ReaderVersionProp) === Some("2"))
    // the vector is O(KB): every file under _dv sums to < 64 KB
    val dvBytes = graft.util.Fs
      .du(new java.io.File(s"$root/data/snap-$id2/_dv"))
    assert(dvBytes > 0 && dvBytes < 65536,
      s"DV sidecar should be KB-scale, got $dvBytes bytes")
    // Scala read path
    val left = SnapshotStore.read(spark, root)
    assert(left.count() === 180L)
    assert(left.filter(col("id") % 10 === 3).count() === 0L)
    // SQL catalog read path (the DSV2 DV rewrite)
    val wh = new java.io.File(root).getParent
    spark.conf.set("spark.sql.catalog.dvspec",
      classOf[graft.sources.GraftSnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.dvspec.warehouse", wh)
    val tbl = s"dvspec.`${new java.io.File(root).getName}`"
    assert(spark.sql(s"SELECT count(*) AS c FROM $tbl").head().getLong(0)
      === 180L)
    assert(spark.sql(
      s"SELECT count(*) AS c FROM $tbl WHERE id % 10 = 3")
      .head().getLong(0) === 0L)
    // aggregate through SQL must match the Scala read exactly
    val sqlSum = spark.sql(
      s"SELECT CAST(sum(price) AS DOUBLE) AS s FROM $tbl")
      .head().getDouble(0)
    val scalaSum = left.agg(sum("price")).head().getDouble(0)
    assert(math.abs(sqlSum - scalaSum) < 1e-9)
    // time travel to the pre-delete snapshot sees everything
    assert(SnapshotStore.read(spark, root, asOf = Some(id1)).count()
      === 200L)
    // history reports LIVE rows
    assert(SnapshotStore.history(root).last.rows === Some(180L))
    // CDC sidecar: exactly the 20 deleted rows
    val feed = SnapshotStore.changeFeed(spark, root, 1L, 2L)
    assert(feed.filter(col("_change_type") === "delete").count() === 20L)
    assert(feed.count() === 20L)
  }

  test("stacked DV deletes merge vectors; the second commit's sidecar " +
      "carries the union and reads stay exact") {
    val root = tmpRoot("stack")
    SnapshotStore.write(rows(), root, "m", "ts")
    RowLevelOps.deleteRowsCommit(spark, root, col("id") % 10 === 3,
      "m", "ts")
    val id3 = RowLevelOps.deleteRowsCommit(spark, root,
      col("id") % 10 === 4, "m", "ts")
    val m = SnapshotStore.current(root).get
    assert(m.entries.forall(e => e.dv.exists(_.rows === 20L) &&
      e.dv.get.dir.startsWith(s"data/snap-$id3/")))
    val left = SnapshotStore.read(spark, root)
    assert(left.count() === 160L)
    assert(left.filter(col("id") % 10 === 3 || col("id") % 10 === 4)
      .count() === 0L)
    // already-deleted rows never re-match: the second commit's CDC is
    // exactly the %10==4 rows
    assert(SnapshotStore.changeFeed(spark, root, 2L, 3L).count() === 20L)
  }

  test("UPDATE takes the DV path: delete positions + post-images as " +
      "additive parts; a partition-moving SET relocates rows") {
    val root = tmpRoot("upd")
    SnapshotStore.write(rows(), root, "m", "ts")
    val before = SnapshotStore.read(spark, root)
      .agg(sum("price")).head().getDouble(0)
    val id2 = RowLevelOps.updateCommit(spark, root,
      col("id") % 10 === 5, Seq("price" -> (col("price") + 5.0)),
      "m", "ts")
    val m2 = SnapshotStore.current(root).get
    // source entries keep their dirs with a 10-position vector each;
    // the post-image parts are NEW additive entries of the same values
    assert(m2.entries.count(_.dv.isDefined) === 2)
    assert(m2.entries.count(e =>
      e.dir.startsWith(s"data/snap-$id2/") && e.dv.isEmpty) === 2)
    val after = SnapshotStore.read(spark, root)
    assert(after.count() === 200L)
    assert(math.abs(after.agg(sum("price")).head().getDouble(0)
      - (before + 20 * 5.0)) < 1e-9)
    // CDC: pre+post images for all 20 updated rows
    val feed = SnapshotStore.changeFeed(spark, root, 1L, 2L)
    assert(feed.groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap ===
      Map("update_preimage" -> 20L, "update_postimage" -> 20L))
    // partition-moving SET: rows leave their month via DV + land in a
    // new partition as an additive/new entry
    RowLevelOps.updateCommit(spark, root,
      col("id") % 10 === 6, Seq("m" -> lit("2024-03")), "m", "ts")
    val byMonth = SnapshotStore.read(spark, root)
      .groupBy("m").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byMonth === Map("2024-01" -> 90L, "2024-02" -> 90L,
      "2024-03" -> 20L))
    assert(SnapshotStore.read(spark, root).count() === 200L)
  }

  test("a high delete fraction falls back to copy-on-write; one " +
      "statement can mix DV and COW per value group") {
    val root = tmpRoot("mix")
    SnapshotStore.write(rows(), root, "m", "ts")
    // Jan: 10% of rows (DV); Feb: 50% (COW restatement)
    val id2 = RowLevelOps.deleteRowsCommit(spark, root,
      (col("m") === "2024-01" && col("id") % 10 === 7) ||
        (col("m") === "2024-02" && col("id") % 2 === 0),
      "m", "ts")
    val m = SnapshotStore.current(root).get
    val jan = m.entries.find(_.value === "2024-01").get
    val feb = m.entries.find(_.value === "2024-02").get
    assert(jan.dv.exists(_.rows === 10L), "Jan takes the DV path")
    assert(feb.dv.isEmpty && feb.dir.startsWith(s"data/snap-$id2/"),
      "Feb restates copy-on-write")
    val left = SnapshotStore.read(spark, root)
    assert(left.count() === (90L + 50L))
    // CDC covers both strategies' rows in one sidecar
    assert(SnapshotStore.changeFeed(spark, root, 1L, 2L).count() === 60L)
  }

  test("graft.dv.enabled=false reproduces byte-identical results " +
      "through pure copy-on-write") {
    val rootDv = tmpRoot("twin_dv")
    val rootCow = tmpRoot("twin_cow")
    SnapshotStore.write(rows(), rootDv, "m", "ts")
    SnapshotStore.write(rows(), rootCow, "m", "ts")
    RowLevelOps.deleteRowsCommit(spark, rootDv,
      col("id") % 10 === 3, "m", "ts")
    RowLevelOps.updateCommit(spark, rootDv, col("id") % 10 === 5,
      Seq("price" -> (col("price") + 5.0)), "m", "ts")
    spark.conf.set("graft.dv.enabled", "false")
    try {
      RowLevelOps.deleteRowsCommit(spark, rootCow,
        col("id") % 10 === 3, "m", "ts")
      RowLevelOps.updateCommit(spark, rootCow, col("id") % 10 === 5,
        Seq("price" -> (col("price") + 5.0)), "m", "ts")
    } finally spark.conf.unset("graft.dv.enabled")
    assert(SnapshotStore.current(rootCow).get.entries
      .forall(_.dv.isEmpty), "the twin must be pure copy-on-write")
    def dump(root: String) = SnapshotStore.read(spark, root)
      .select("id", "m", "price").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    assert(dump(rootDv) === dump(rootCow))
  }

  test("compact folds vectors into clean files and lifts the " +
      "reader-era requirement") {
    val root = tmpRoot("fold")
    SnapshotStore.write(rows(), root, "m", "ts")
    RowLevelOps.deleteRowsCommit(spark, root, col("id") % 10 === 3,
      "m", "ts")
    assert(SnapshotStore.current(root).get.props
      .contains(SnapshotStore.ReaderVersionProp))
    SnapshotStore.compact(spark, root, "m", "ts")
    val m = SnapshotStore.current(root).get
    assert(m.entries.forall(_.dv.isEmpty))
    assert(!m.props.contains(SnapshotStore.ReaderVersionProp),
      "folding the last DV lifts the era requirement")
    assert(SnapshotStore.read(spark, root).count() === 180L)
  }

  test("expire pins the sidecar snap dirs of retained DV references") {
    val root = tmpRoot("pin")
    SnapshotStore.write(rows(), root, "m", "ts")
    val id2 = RowLevelOps.deleteRowsCommit(spark, root,
      col("id") % 10 === 3, "m", "ts") // vector lives under snap-id2
    // a later append makes the head a commit whose OWN snap dir does
    // not hold the vector
    SnapshotStore.appendPartitions(rows(1).filter(col("id") === 1L)
      .withColumn("id", col("id") + 1000L), root, "m", "ts")
    SnapshotStore.expire(root, keepLast = 1)
    assert(new java.io.File(s"$root/data/snap-$id2/_dv").isDirectory,
      "retention must pin the DV sidecar the head references")
    assert(SnapshotStore.read(spark, root).count() === 181L)
  }

  test("a partition-moving UPDATE landing in a DV-routed value DEMOTES " +
      "that value to copy-on-write — restatement and vector never " +
      "share an entry") {
    val root = tmpRoot("collide")
    SnapshotStore.write(rows(), root, "m", "ts")
    // one statement: half of 2024-01 MOVES to 2024-02 (COW — fraction
    // 0.5), while 10 rows of 2024-02 update in place (would be DV —
    // but the movers LAND there, so the group must demote)
    RowLevelOps.updateCommit(spark, root,
      (col("m") === "2024-01" && col("id") % 2 === 0) ||
        (col("m") === "2024-02" && col("id") % 10 === 3),
      Seq("m" -> lit("2024-02")), "m", "ts")
    val byMonth = SnapshotStore.read(spark, root)
      .groupBy("m").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byMonth === Map("2024-01" -> 50L, "2024-02" -> 150L))
    assert(SnapshotStore.read(spark, root).count() === 200L)
    val m = SnapshotStore.current(root).get
    assert(m.entries.filter(_.value == "2024-02").forall(_.dv.isEmpty),
      "the landing value's group must have been demoted to COW")
  }

  test("an old-vintage COW migration landing in a DV-routed value " +
      "demotes it too (discovery's landing superset)") {
    import spark.implicits._
    val root = tmpRoot("vintcollide")
    // bucket-only layout first: buckets mix months; evolve to month
    SnapshotStore.write(rows(50), root, "bucket(2,id)", "ts")
    SnapshotStore.evolvePartitionSpec(root, "m", Some("ts"))
    // a current-spec month entry joins (small enough for DV routing)
    SnapshotStore.appendPartitions(
      (1000L to 1049L).map(i => (i, "2024-01",
        java.sql.Timestamp.valueOf("2024-01-05 00:00:00"), 1.0))
        .toDF("id", "m", "ts", "price"), root, "m", "ts")
    // one DELETE: most old-bucket rows (COW → survivors MIGRATE into
    // month values, including 2024-01) + 2 rows of the new 2024-01
    // entry (fraction 0.04 → would be DV, must demote)
    RowLevelOps.deleteRowsCommit(spark, root,
      (col("id") < 1000L && col("id") % 2 === 0) ||
        col("id").isin(1000L, 1001L), "m", "ts")
    val left = SnapshotStore.read(spark, root)
    assert(left.count() === (50L - 25L) + (50L - 25L) + 48L)
    assert(left.filter(col("id") < 1000L && col("id") % 2 === 0)
      .count() === 0L)
    assert(left.filter(col("id").isin(1000L, 1001L)).count() === 0L)
  }

  test("a vector covering every row drops the entry; the batch change " +
      "feed survives a rollback across DV commits (entry-based diff)") {
    val root = tmpRoot("drop")
    SnapshotStore.write(rows(), root, "m", "ts")
    spark.conf.set("graft.dv.maxDeleteFraction", "1.0")
    try {
      RowLevelOps.deleteRowsCommit(spark, root, col("m") === "2024-01",
        "m", "ts")
    } finally spark.conf.unset("graft.dv.maxDeleteFraction")
    val m = SnapshotStore.current(root).get
    assert(m.entries.map(_.value) === Seq("2024-02"),
      "a fully-deleted entry drops from the manifest")
    assert(SnapshotStore.read(spark, root).count() === 100L)
    // rollback to the pre-delete state: a DV-only difference the
    // dir-set diff could not see — the entry-based feed emits the
    // resurrected rows as inserts
    SnapshotStore.rollback(root, 1L)
    assert(SnapshotStore.read(spark, root).count() === 200L)
    val feed = SnapshotStore.changeFeed(spark, root, 2L, 3L)
    val byType = feed.groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType === Map("insert" -> 100L),
      s"rollback across a DV commit must resurrect Jan, got $byType")
  }
}
