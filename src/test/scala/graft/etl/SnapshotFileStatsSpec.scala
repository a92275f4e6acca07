package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-FILE sort-column stats ([[SnapshotStore.FileStats]]) and the
  * scan's file-grain skipping: after a range binpack the files of a
  * partition are contiguous, non-overlapping sort runs, and a narrow
  * sort-range probe must plan ONLY the overlapping files of a kept
  * dir — the Iceberg per-file data-skipping economics on top of the
  * entry-grain dir skipping. */
class SnapshotFileStatsSpec extends SparkSpec {

  import spark.implicits._

  private def tmpRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_fst_$tag").toString

  /** One big March + one small April; March splits under binpack. */
  private def mkTable(tag: String): String = {
    val root = tmpRoot(tag)
    val df = ((1 to 20000).map(i => (i.toLong, "2024-03",
      java.sql.Timestamp.valueOf(
        f"2024-03-${i % 28 + 1}%02d ${i % 24}%02d:00:00"),
      i * 1.5, s"pad-$i-${"x" * 64}")) ++
      (1 to 500).map(i => (50000L + i, "2024-04",
        java.sql.Timestamp.valueOf(f"2024-04-${i % 28 + 1}%02d 00:00:00"),
        i * 2.0, s"pad-$i")))
      .toDF("id", "m", "ts", "price", "pad")
    SnapshotStore.write(df, root, "m", "ts")
    root
  }

  private def filesIn(root: String, dir: String): Seq[java.io.File] =
    Option(new java.io.File(s"$root/$dir").listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).toSeq

  private def plannedFiles(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2
          .DataSourceV2ScanRelation => r.scan
    }.collect {
      case f: org.apache.spark.sql.execution.datasources.v2.FileScan =>
        f.planInputPartitions().toSeq.collect {
          case fp: org.apache.spark.sql.execution.datasources
              .FilePartition => fp.files.toSeq
        }.flatten.map(_.filePath.toPath.getName)
    }.flatten

  private def register(root: String, cat: String): String = {
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftSnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse",
      new java.io.File(root).getParent)
    s"$cat.`${new java.io.File(root).getName}`"
  }

  test("every commit records per-file sort-column stats; a binpack " +
      "split yields disjoint per-file ranges that round-trip through " +
      "the manifest on disk") {
    val root = mkTable("rt")
    val e0 = SnapshotStore.current(root).get.entries
      .find(_.value == "2024-03").get
    assert(e0.stats.get.files.size === 1)
    assert(e0.stats.get.files.head.cols.contains("ts"),
      "the sort column must carry per-file stats")
    val bytes = filesIn(root, e0.dir).map(_.length).sum
    SnapshotStore.rewriteDataFiles(spark, root,
      where = _ == "2024-03", targetFileBytes = bytes / 4,
      onlyDirty = false)
    // current() re-parses the manifest from disk: files round-trip
    val e1 = SnapshotStore.current(root).get.entries
      .find(_.value == "2024-03").get
    val fstats = e1.stats.get.files
    assert(fstats.size === filesIn(root, e1.dir).size)
    assert(fstats.size >= 2, "binpack must have split the big month")
    assert(fstats.map(_.rows).sum === e1.stats.get.rows)
    // disjoint, contiguous runs in the recorded stats themselves
    val ranges = fstats.flatMap(f => f.cols.get("ts"))
      .map(cs => (java.time.Instant.parse(cs.min),
        java.time.Instant.parse(cs.max)))
      .sortBy(_._1)
    assert(ranges.size === fstats.size)
    ranges.foreach { case (mn, mx) => assert(!mx.isBefore(mn)) }
    ranges.sliding(2).foreach {
      case Seq((_, aMax), (bMin, _)) =>
        assert(!bMin.isBefore(aMax) || aMax == bMin,
          "recorded per-file ranges must not overlap")
      case _ => ()
    }
  }

  test("a narrow sort-range probe plans ONLY the overlapping files " +
      "of the kept dir (other months drop at dir grain, other slices " +
      "at file grain) and matches the unpruned result exactly") {
    val root = mkTable("probe")
    val e0 = SnapshotStore.current(root).get.entries
      .find(_.value == "2024-03").get
    val bytes = filesIn(root, e0.dir).map(_.length).sum
    SnapshotStore.rewriteDataFiles(spark, root,
      where = _ == "2024-03", targetFileBytes = bytes / 4,
      onlyDirty = false)
    val e1 = SnapshotStore.current(root).get.entries
      .find(_.value == "2024-03").get
    val marchFiles = filesIn(root, e1.dir).map(_.getName).toSet
    assert(marchFiles.size >= 3, "fixture needs a real split")
    val t = register(root, "fstcat")
    val q = s"""SELECT count(*) AS c, CAST(sum(price) AS DOUBLE) AS s
               |FROM $t
               |WHERE ts >= TIMESTAMP'2024-03-02 00:00:00'
               |  AND ts < TIMESTAMP'2024-03-03 00:00:00'""".stripMargin
    val df = spark.sql(q)
    val planned = plannedFiles(df)
    assert(planned.nonEmpty)
    assert(planned.forall(marchFiles), "April must drop at dir grain")
    assert(planned.size < marchFiles.size,
      s"file-grain skipping must drop non-overlapping slices " +
        s"(planned ${planned.size} of ${marchFiles.size})")
    // correctness: identical to the same query with pruning disabled
    val expected = {
      spark.conf.set("spark.graft.read.statsPrune", "false")
      try spark.sql(q).collect().toSeq
      finally spark.conf.set("spark.graft.read.statsPrune", "true")
    }
    assert(df.collect().toSeq === expected)
  }

  test("RENAME COLUMN re-keys the per-file stats: a probe by the new " +
      "name still skips files and answers correctly") {
    val root = mkTable("ren")
    val e0 = SnapshotStore.current(root).get.entries
      .find(_.value == "2024-03").get
    val bytes = filesIn(root, e0.dir).map(_.length).sum
    SnapshotStore.rewriteDataFiles(spark, root,
      where = _ == "2024-03", targetFileBytes = bytes / 4,
      onlyDirty = false)
    val t = register(root, "fstren")
    spark.sql(s"ALTER TABLE $t RENAME COLUMN ts TO event_ts")
    val e1 = SnapshotStore.current(root).get.entries
      .find(_.value == "2024-03").get
    assert(e1.stats.get.files.forall(_.cols.contains("event_ts")),
      "per-file stats must re-key with the rename")
    val marchFiles = filesIn(root, e1.dir).map(_.getName).toSet
    val df = spark.sql(
      s"""SELECT count(*) AS c FROM $t
         |WHERE event_ts >= TIMESTAMP'2024-03-02 00:00:00'
         |  AND event_ts < TIMESTAMP'2024-03-03 00:00:00'""".stripMargin)
    val planned = plannedFiles(df)
    assert(planned.nonEmpty && planned.size < marchFiles.size,
      "file skipping must survive the rename")
    val cnt = df.head().getLong(0)
    val truth = SnapshotStore.read(spark, root)
      .filter(col("event_ts") >= lit("2024-03-02 00:00:00") &&
        col("event_ts") < lit("2024-03-03 00:00:00")).count()
    assert(cnt === truth)
  }
}
