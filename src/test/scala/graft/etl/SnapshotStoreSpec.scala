package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SnapshotStoreSpec extends SparkSpec {

  private def mkRows(febPrice: Double) = {
    import spark.implicits._
    Seq(
      (1L, "2024-01", java.sql.Timestamp.valueOf("2024-01-03 00:00:00"), 10.0),
      (2L, "2024-01", java.sql.Timestamp.valueOf("2024-01-20 00:00:00"), 20.0),
      (3L, "2024-02", java.sql.Timestamp.valueOf("2024-02-05 00:00:00"), febPrice),
      (4L, "2024-02", java.sql.Timestamp.valueOf("2024-02-25 00:00:00"), febPrice))
      .toDF("id", "m", "ts", "price")
  }

  private def tmpRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_snap_$tag").toString

  private def state(root: String, asOf: Option[Long] = None)
      : Map[String, Double] =
    SnapshotStore.read(spark, root, asOf)
      .groupBy("m").agg(sum("price").as("s")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap

  test("write → read round trip; backfill restates one partition and " +
      "carries the other forward by reference (same physical files)") {
    val root = tmpRoot("bf")
    val id1 = SnapshotStore.write(mkRows(30.0), root, "m", "ts")
    assert(id1 === 1L)
    assert(state(root) === Map("2024-01" -> 30.0, "2024-02" -> 60.0))
    // schema round-trips without the internal __part key
    assert(SnapshotStore.read(spark, root).columns.toSeq ===
      Seq("id", "m", "ts", "price"))

    val janDirBefore = SnapshotStore.current(root).get
      .entries.find(_.value == "2024-01").get.dir
    val corrected = mkRows(99.0).filter(col("m") === "2024-02")
    val id2 = SnapshotStore.overwritePartitions(corrected, root, "m", "ts")
    assert(id2 === 2L)
    assert(state(root) === Map("2024-01" -> 30.0, "2024-02" -> 198.0))
    // untouched partition: the SAME dir, carried by reference — cost
    // of the backfill is proportional to the restated data only
    val m2 = SnapshotStore.current(root).get
    assert(m2.entries.find(_.value == "2024-01").get.dir === janDirBefore)
    assert(m2.entries.find(_.value == "2024-02").get.dir
      .startsWith("data/snap-2/"))
    // the new snap dir holds ONLY the restated partition
    assert(new java.io.File(s"$root/data/snap-2").listFiles()
      .map(_.getName).filter(_.startsWith("__part=")).toSeq ===
      Seq("__part=2024-02"))
  }

  test("time travel: a retained manifest replays the pre-backfill state") {
    val root = tmpRoot("tt")
    val id1 = SnapshotStore.write(mkRows(30.0), root, "m", "ts")
    SnapshotStore.overwritePartitions(
      mkRows(99.0).filter(col("m") === "2024-02"), root, "m", "ts")
    assert(state(root, asOf = Some(id1)) ===
      Map("2024-01" -> 30.0, "2024-02" -> 60.0))
    assert(state(root) === Map("2024-01" -> 30.0, "2024-02" -> 198.0))
  }

  test("a reader concurrent with backfills sees exactly one committed " +
      "snapshot per read — never a mix, never an error") {
    val root = tmpRoot("conc")
    SnapshotStore.write(mkRows(0.0), root, "m", "ts")
    // every state the table ever commits: feb sum = 2k for backfill k
    val nBackfills = 8
    val valid = (0 to nBackfills)
      .map(k => Map("2024-01" -> 30.0, "2024-02" -> 2.0 * k)).toSet

    val seen = java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[Map[String, Double], java.lang.Boolean]())
    val bad = new java.util.concurrent.atomic.AtomicReference[String](null)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val reader = new Thread(() => {
      while (!stop.get() && bad.get() == null) {
        try {
          val s = state(root)
          seen.add(s)
          if (!valid(s)) bad.set(s"mixed/unknown state observed: $s")
        } catch {
          case e: Throwable => bad.set(s"reader threw: ${e.getMessage}")
        }
      }
    })
    reader.start()
    try
      (1 to nBackfills).foreach { k =>
        SnapshotStore.overwritePartitions(
          mkRows(k.toDouble).filter(col("m") === "2024-02"), root, "m", "ts")
      }
    finally {
      stop.set(true); reader.join(60000)
    }
    assert(bad.get() == null, String.valueOf(bad.get()))
    assert(seen.size >= 1) // the reader did observe committed states
    // and the final read is the last commit
    assert(state(root) ===
      Map("2024-01" -> 30.0, "2024-02" -> 2.0 * nBackfills))
  }

  test("retention UNDER LOAD: a background expire loop interleaved " +
      "with racing backfills and a live reader loses nothing — no " +
      "reader error, no lost partition, history still bounded") {
    import spark.implicits._
    val root = tmpRoot("expload")
    SnapshotStore.write(mkRows(0.0), root, "m", "ts")
    val nBackfills = 8
    // reader validity: jan fixed at 30, feb walks 2k per backfill k —
    // a torn mix or a partially-expired read would break the pairing
    val valid = (0 to nBackfills)
      .map(k => Map("2024-01" -> 30.0, "2024-02" -> 2.0 * k)).toSet
    val bad = new java.util.concurrent.atomic.AtomicReference[String](null)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val reader = new Thread(() => {
      while (!stop.get() && bad.get() == null) {
        try {
          val s = state(root)
          if (!valid(s)) bad.set(s"mixed/unknown state observed: $s")
        } catch {
          case e: Throwable => bad.set(s"reader threw: ${e.getMessage}")
        }
      }
    })
    // the expire loop races the commits for the whole run; keepLast=3
    // keeps the horizon comfortably ahead of one in-flight read (a
    // reader slower than the retention horizon is out of contract by
    // design — that is what the horizon MEANS)
    val expirer = new Thread(() => {
      while (!stop.get()) {
        try SnapshotStore.expire(root, keepLast = 3)
        catch { case e: Throwable => bad.set(s"expire threw: ${e.getMessage}") }
        Thread.sleep(20)
      }
    })
    reader.start(); expirer.start()
    try
      (1 to nBackfills).foreach { k =>
        SnapshotStore.overwritePartitions(
          mkRows(k.toDouble).filter(col("m") === "2024-02"), root, "m", "ts")
      }
    finally { stop.set(true); reader.join(60000); expirer.join(60000) }
    assert(bad.get() == null, String.valueOf(bad.get()))
    // no lost partition: the final state is the last commit, both months
    assert(state(root) ===
      Map("2024-01" -> 30.0, "2024-02" -> 2.0 * nBackfills))
    // retention actually ran under load: one final pass bounds history
    // to the horizon and the early snapshots' manifests are gone
    SnapshotStore.expire(root, keepLast = 3)
    val kept = new java.io.File(s"$root/manifests").listFiles()
      .map(_.getName).filter(_.startsWith("manifest-"))
      .map(_.stripPrefix("manifest-").toLong).sorted.toSeq
    assert(kept.size <= 3 && kept.contains(SnapshotStore.current(root).get.id))
    assert(!kept.contains(1L), "expire never dropped the initial snapshot")
    // the jan partition expire must never have deleted: EVERY retained
    // manifest still references a live jan dir (snap-1's, carried)
    kept.foreach { id =>
      val jan = SnapshotStore.manifestAt(root, id).entries
        .find(_.value == "2024-01").get
      assert(new java.io.File(s"$root/${jan.dir}").isDirectory,
        s"manifest $id references an expired jan dir ${jan.dir}")
    }
  }

  test("compact commits a fresh snapshot in place; the prior manifest " +
      "still reads; expire then drops it and keeps the current") {
    val root = tmpRoot("cmp")
    SnapshotStore.write(mkRows(30.0), root, "m", "ts")
    SnapshotStore.overwritePartitions(
      mkRows(99.0).filter(col("m") === "2024-02"), root, "m", "ts")
    val id3 = SnapshotStore.compact(spark, root, "m", "ts")
    assert(id3 === 3L)
    assert(state(root) === Map("2024-01" -> 30.0, "2024-02" -> 198.0))
    // pre-compaction manifests are intact (old dirs never mutated)
    assert(state(root, asOf = Some(2L)) ===
      Map("2024-01" -> 30.0, "2024-02" -> 198.0))
    assert(state(root, asOf = Some(1L)) ===
      Map("2024-01" -> 30.0, "2024-02" -> 60.0))

    SnapshotStore.expire(root, keepLast = 1)
    // current unaffected; expired snapshots' dirs are gone
    assert(state(root) === Map("2024-01" -> 30.0, "2024-02" -> 198.0))
    val snapDirs = new java.io.File(s"$root/data").listFiles()
      .map(_.getName).toSet
    assert(snapDirs === Set("snap-3"))
    intercept[Exception] { state(root, asOf = Some(1L)) }
    // ids keep advancing past expired history (no reuse)
    assert(SnapshotStore.write(mkRows(1.0), root, "m", "ts") === 4L)
  }

  test("two concurrent writers backfilling DIFFERENT partitions lose " +
      "no update: the commit lock serializes read-prior → publish") {
    import spark.implicits._
    val root = tmpRoot("writers")
    SnapshotStore.write(mkRows(0.0), root, "m", "ts")
    // thread A restates 2024-01 k times; thread B restates 2024-02 k
    // times; without the commit lock a publish can carry a prior
    // manifest that predates the other thread's commit — silently
    // reverting that month (the lost update)
    val k = 6
    def backfill(month: String, v: Double): Unit = {
      val rows = Seq(
        (10L, month, java.sql.Timestamp.valueOf(s"$month-05 00:00:00"), v),
        (11L, month, java.sql.Timestamp.valueOf(s"$month-25 00:00:00"), v))
        .toDF("id", "m", "ts", "price")
      SnapshotStore.overwritePartitions(rows, root, "m", "ts")
    }
    val err = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    def writer(month: String): Thread = {
      val t = new Thread(() => {
        try (1 to k).foreach(i => backfill(month, i.toDouble))
        catch { case e: Throwable => err.compareAndSet(null, e) }
      })
      t.start(); t
    }
    val (a, b) = (writer("2024-01"), writer("2024-02"))
    a.join(120000); b.join(120000)
    assert(err.get() == null, String.valueOf(err.get()))
    // BOTH months show their final restatement — neither was reverted
    assert(state(root) ===
      Map("2024-01" -> 2.0 * k, "2024-02" -> 2.0 * k))
    // and the history is a strictly increasing id chain of 2k commits
    assert(SnapshotStore.current(root).get.id === 1L + 2 * k)
  }

  test("schema evolution: a backfill adding a column merges it into " +
      "the table schema; old dirs read null, type changes fail the " +
      "commit, time travel keeps the old shape") {
    import spark.implicits._
    val root = tmpRoot("evolve")
    val id1 = SnapshotStore.write(mkRows(30.0), root, "m", "ts")
    // restate 2024-02 with a NEW column
    val withNote = mkRows(99.0).filter(col("m") === "2024-02")
      .withColumn("note", concat(lit("n"), col("id")))
    SnapshotStore.overwritePartitions(withNote, root, "m", "ts")
    val cur = SnapshotStore.read(spark, root)
    assert(cur.columns.toSeq === Seq("id", "m", "ts", "price", "note"))
    val notes = cur.select("m", "note").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toSet
    // carried January dirs: null note; restated February: real values
    assert(notes === Set("2024-01" -> None,
      "2024-02" -> Some("n3"), "2024-02" -> Some("n4")))
    // time travel replays the PRE-evolution schema
    assert(SnapshotStore.read(spark, root, asOf = Some(id1))
      .columns.toSeq === Seq("id", "m", "ts", "price"))
    // a type change is refused at the commit boundary, pointer unmoved
    val before = SnapshotStore.current(root).get.id
    intercept[IllegalArgumentException] {
      SnapshotStore.overwritePartitions(
        mkRows(1.0).filter(col("m") === "2024-02")
          .withColumn("price", col("price").cast("string")),
        root, "m", "ts")
    }
    assert(SnapshotStore.current(root).get.id === before)
    // a backfill MISSING an evolved column keeps it in the schema;
    // the restated rows read it as null
    SnapshotStore.overwritePartitions(
      mkRows(7.0).filter(col("m") === "2024-02"), root, "m", "ts")
    val after = SnapshotStore.read(spark, root)
    assert(after.columns.contains("note"))
    assert(after.filter(col("m") === "2024-02" && col("note").isNotNull)
      .count() === 0)
  }

  test("a crash between data write and manifest publish cannot wedge " +
      "the table: orphaned snap dirs are skipped by id allocation, " +
      "invisible to readers, and swept by expire") {
    val root = tmpRoot("crash")
    SnapshotStore.write(mkRows(30.0), root, "m", "ts")
    // simulate the crash artifacts: a data dir with no manifest, and a
    // torn pointer staging file
    val orphan = new java.io.File(s"$root/data/snap-2/__part=2024-01")
    assert(orphan.mkdirs())
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$root/.MANIFEST.tmp-2"), "torn")
    // readers are unaffected (no manifest references the orphan)
    assert(state(root) === Map("2024-01" -> 30.0, "2024-02" -> 60.0))
    // the next commit must NOT reuse id 2 (errorifexists would wedge)
    val id = SnapshotStore.overwritePartitions(
      mkRows(99.0).filter(col("m") === "2024-02"), root, "m", "ts")
    assert(id === 3L)
    assert(state(root) === Map("2024-01" -> 30.0, "2024-02" -> 198.0))
    // expire sweeps the orphan and the torn staging file
    SnapshotStore.expire(root, keepLast = 2)
    assert(!new java.io.File(s"$root/data/snap-2").exists())
    assert(!new java.io.File(s"$root/.MANIFEST.tmp-2").exists())
    assert(state(root) === Map("2024-01" -> 30.0, "2024-02" -> 198.0))
  }

  test("MergeTreeWriter.compact refuses in-place compaction (its " +
      "contract is compact-to-a-NEW-path; SnapshotStore owns in-place)") {
    intercept[IllegalArgumentException] {
      MergeTreeWriter.compact(spark, "/tmp/graft_same_dir",
        "/tmp/graft_same_dir")
    }
    intercept[IllegalArgumentException] { // path-normalized, not string
      MergeTreeWriter.compact(spark, "/tmp/graft_same_dir",
        "/tmp/./graft_same_dir/")
    }
  }

  test("manifest-entry pruning reads only the kept partition's dir") {
    val root = tmpRoot("prune")
    SnapshotStore.write(mkRows(30.0), root, "m", "ts")
    val jan = SnapshotStore.readWhere(spark, root, _ == "2024-01")
    assert(jan.select("m").distinct().collect().map(_.getString(0)).toSeq
      === Seq("2024-01"))
    // the plan's scan lists exactly one root (decided on the manifest,
    // before any file listing)
    val scanFiles = jan.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.toString().split("\n"))
      .filter(_.contains("snap-1")).mkString
    assert(scanFiles.contains("__part=2024-01") ||
      jan.inputFiles.forall(_.contains("__part=2024-01")))
  }

  test("readWhere carries the manifest schema (evolved columns survive " +
      "a prune), returns a typed EMPTY frame for a no-match prune, and " +
      "predicates see the real partition value, not the escaped token") {
    import spark.implicits._
    val root = tmpRoot("rw")
    SnapshotStore.write(mkRows(30.0), root, "m", "ts")
    SnapshotStore.overwritePartitions(
      mkRows(99.0).filter(col("m") === "2024-02")
        .withColumn("note", lit("x")), root, "m", "ts")
    // pruned read of the CARRIED pre-evolution dir still has the
    // evolved column (null-filled) — the manifest schema applies
    val jan = SnapshotStore.readWhere(spark, root, _ == "2024-01")
    assert(jan.columns.toSeq === Seq("id", "m", "ts", "price", "note"))
    assert(jan.count() === 2 &&
      jan.filter(col("note").isNotNull).count() === 0)
    // a prune keeping nothing is a normal empty result, not a crash
    val none = SnapshotStore.readWhere(spark, root, _ == "2025-12")
    assert(none.columns.toSeq === Seq("id", "m", "ts", "price", "note"))
    assert(none.count() === 0)

    // partition values Spark must escape in dir names ('/', ':')
    // round-trip: the manifest stores real values, readWhere matches
    // them, and the dirs on disk are the escaped tokens
    val root2 = tmpRoot("esc")
    val odd = Seq(
      (1L, "2024/01:a", java.sql.Timestamp.valueOf("2024-01-03 00:00:00"), 1.0),
      (2L, "2024/02:b", java.sql.Timestamp.valueOf("2024-02-03 00:00:00"), 2.0))
      .toDF("id", "m", "ts", "price")
    SnapshotStore.write(odd, root2, "m", "ts")
    assert(SnapshotStore.current(root2).get.entries.map(_.value).sorted
      === Seq("2024/01:a", "2024/02:b"))
    val one = SnapshotStore.readWhere(spark, root2, _ == "2024/01:a")
    assert(one.count() === 1 && one.head().getString(1) === "2024/01:a")
  }

  test("hostile partition values survive the manifest format: a value " +
      "spelled 'schema=x' cannot be mis-parsed as the header line") {
    import spark.implicits._
    val root = tmpRoot("hostile")
    val rows = Seq(
      (1L, "schema=x", java.sql.Timestamp.valueOf("2024-01-03 00:00:00"), 1.0),
      (2L, "id=9", java.sql.Timestamp.valueOf("2024-02-03 00:00:00"), 2.0))
      .toDF("id", "m", "ts", "price")
    SnapshotStore.write(rows, root, "m", "ts")
    // both partitions survive the render→parse round trip AND the read
    val m = SnapshotStore.current(root).get
    assert(m.entries.map(_.value).sorted === Seq("id=9", "schema=x"))
    assert(m.schema.isDefined) // the real header also survived
    assert(SnapshotStore.read(spark, root).count() === 2)
    assert(SnapshotStore.readWhere(spark, root, _ == "schema=x")
      .count() === 1)
  }

  test("expire pins the LIVE pointer's dirs even when a crash left a " +
      "newer unadopted manifest in history") {
    val root = tmpRoot("expcrash")
    SnapshotStore.write(mkRows(30.0), root, "m", "ts")
    SnapshotStore.overwritePartitions(
      mkRows(99.0).filter(col("m") === "2024-02"), root, "m", "ts")
    // simulate a crash inside commitManifest: manifest-3 reached
    // history but the pointer swap never happened — MANIFEST still
    // names snapshot 2's dirs, and manifest-3 references a snap-3 dir
    // that was never fully committed
    val m3 = java.nio.file.Paths.get(root, "manifests/manifest-3")
    java.nio.file.Files.writeString(m3, "id=3\nv\tdata/snap-3\n")
    SnapshotStore.expire(root, keepLast = 1)
    // the live pointer's table is intact — snap-1's carried January
    // dir and snap-2's February dir were pinned by the POINTER, not
    // the history listing
    assert(state(root) === Map("2024-01" -> 30.0, "2024-02" -> 198.0))
  }

  test("the commit lock is reentrant on one root and does not create " +
      "phantom table dirs for failing operations") {
    // nested public-API composition under one lock must not die on
    // OverlappingFileLockException
    val root = tmpRoot("reent")
    SnapshotStore.commitDir(root) { dir =>
      new java.io.File(dir).mkdirs()
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(dir, "f.txt"), "x")
      SnapshotStore.expire(root, keepLast = 5) // nested acquisition
    }
    assert(SnapshotStore.currentDir(root).isDefined)

    // a typo'd root fails WITHOUT leaving a directory behind
    val ghost = s"${sys.props("java.io.tmpdir")}/graft_ghost_${System.nanoTime()}"
    intercept[IllegalStateException] {
      SnapshotStore.overwritePartitions(mkRows(1.0), ghost, "m", "ts")
    }
    assert(!new java.io.File(ghost).exists())
    SnapshotStore.expire(ghost, keepLast = 1) // pure no-op
    assert(!new java.io.File(ghost).exists())
  }

  test("commitDir publishes an export dir atomically; currentDir flips " +
      "only on commit") {
    val root = tmpRoot("exp")
    assert(SnapshotStore.currentDir(root).isEmpty)
    SnapshotStore.commitDir(root) { dir =>
      CsvExport.write(mkRows(30.0).select("id", "price"), dir, shards = 2)
    }
    val d1 = SnapshotStore.currentDir(root).get
    assert(new java.io.File(d1).listFiles().exists(_.getName.endsWith(".gz")))
    SnapshotStore.commitDir(root) { dir =>
      CsvExport.write(mkRows(99.0).select("id", "price"), dir, shards = 2)
    }
    val d2 = SnapshotStore.currentDir(root).get
    assert(d1 != d2 && d2.endsWith("data/snap-2"))
    // the first export's files are untouched (a reader mid-poll on the
    // old pointer still has a complete shard set)
    assert(new java.io.File(d1).listFiles().exists(_.getName.endsWith(".gz")))
  }

  test("within-partition time order survives the dynamic-partition " +
      "writer (the sort-prefix contract)") {
    import spark.implicits._
    val root = tmpRoot("sorted")
    // enough rows that a destroyed secondary sort would be visible
    val rows = (1 to 500).map(i =>
      (i.toLong, if (i % 2 == 0) "2024-01" else "2024-02",
        java.sql.Timestamp.valueOf(f"2024-01-01 00:${(i * 7) % 60}%02d:${(i * 13) % 60}%02d"),
        i.toDouble))
    SnapshotStore.write(
      rows.toDF("id", "m", "ts", "price").repartition(7), root, "m", "ts")
    val m = SnapshotStore.current(root).get
    m.entries.foreach { e =>
      val ts = spark.read.parquet(s"$root/${e.dir}")
        .select("ts").collect().map(_.getTimestamp(0).getTime)
      assert(ts.sameElements(ts.sorted),
        s"partition ${e.value} lost its time order")
    }
  }
}
