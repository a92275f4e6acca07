package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The cross-host commit chain: every publish atomically claims
  * `manifests/commit-<base.seq+1>` (a hard link — exclusive create is
  * the one POSIX primitive that is a test-and-set across hosts on a
  * shared mount), so two writers racing from one base cannot both
  * win. These specs drive the race deterministically through the
  * `onBeforePublish` seam: a "foreign host" commits inside the exact
  * window between a writer's base read and its chain claim — the
  * window the same-host locks cannot close. */
class CommitChainSpec extends SparkSpec {

  private def mkRows(tag: Double) = {
    import spark.implicits._
    Seq(
      (1L, "2024-01", java.sql.Timestamp.valueOf("2024-01-03 00:00:00"), tag),
      (2L, "2024-02", java.sql.Timestamp.valueOf("2024-02-05 00:00:00"), tag))
      .toDF("id", "m", "ts", "price")
  }

  private def extraRow(id: Long, month: String, tag: Double) = {
    import spark.implicits._
    Seq((id, month,
      java.sql.Timestamp.valueOf(s"$month-10 00:00:00"), tag))
      .toDF("id", "m", "ts", "price")
  }

  private def tmpRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_chain_$tag").toString

  private def totals(root: String): Map[String, Double] =
    SnapshotStore.read(spark, root)
      .groupBy("m").agg(sum("price").as("s")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap

  private def withSeam[T](seam: () => Unit)(f: => T): T = {
    SnapshotStore.onBeforePublish = seam
    try f finally SnapshotStore.onBeforePublish = () => ()
  }

  /** One-shot seam: fires on the NEXT publish only, so the foreign
    * commit it performs doesn't recurse into itself. */
  private def onceSeam(body: => Unit): () => Unit = {
    var fired = false
    () => if (!fired) { fired = true; body }
  }

  test("every commit claims the next chain slot; seq survives carries " +
      "and is recorded in manifest props") {
    val root = tmpRoot("seq")
    SnapshotStore.write(mkRows(10.0), root, "m", "ts")
    assert(SnapshotStore.seqOf(SnapshotStore.current(root).get) === 1L)
    SnapshotStore.appendPartitions(extraRow(3L, "2024-01", 1.0),
      root, "m", "ts")
    assert(SnapshotStore.seqOf(SnapshotStore.current(root).get) === 2L)
    SnapshotStore.overwritePartitions(
      mkRows(7.0).filter(col("m") === "2024-02"), root, "m", "ts")
    assert(SnapshotStore.seqOf(SnapshotStore.current(root).get) === 3L)
    for (s <- 1L to 3L)
      assert(java.nio.file.Files.exists(
        java.nio.file.Paths.get(root, "manifests", s"commit-$s")),
        s"chain slot commit-$s must exist")
  }

  test("a restating commit racing a foreign writer loses LOUDLY — no " +
      "silent lost update, the foreign commit survives intact") {
    val root = tmpRoot("conflict")
    SnapshotStore.write(mkRows(10.0), root, "m", "ts")
    // the foreign host appends a row inside our commit's publish
    // window (its own publish must not re-trigger the seam)
    val seam = onceSeam {
      SnapshotStore.appendPartitions(extraRow(3L, "2024-01", 5.0),
        root, "m", "ts")
    }
    val e = intercept[SnapshotStore.ConcurrentCommitException] {
      withSeam(seam) {
        SnapshotStore.overwritePartitions(
          mkRows(99.0).filter(col("m") === "2024-02"), root, "m", "ts")
      }
    }
    assert(e.getMessage.contains("re-run the transaction"))
    // the winner's state is the table state: the foreign append is
    // there, the losing restatement is not
    assert(totals(root) === Map("2024-01" -> 15.0, "2024-02" -> 10.0))
    // the loser published nothing a reader or time traveler can see:
    // its withdrawn manifest resolves nowhere
    val retained = SnapshotStore.current(root).get
    assert(retained.entries.forall(e2 =>
      java.nio.file.Files.exists(
        java.nio.file.Paths.get(root, e2.dir))))
    // and a plain retry of the same restatement now succeeds cleanly
    SnapshotStore.overwritePartitions(
      mkRows(99.0).filter(col("m") === "2024-02"), root, "m", "ts")
    assert(totals(root) === Map("2024-01" -> 15.0, "2024-02" -> 99.0))
  }

  test("appendPartitions retries a publish conflict automatically: " +
      "both the foreign and the local append land, data written once") {
    val root = tmpRoot("apretry")
    SnapshotStore.write(mkRows(10.0), root, "m", "ts")
    val dataDir = new java.io.File(s"$root/data")
    val seam = onceSeam {
      SnapshotStore.appendPartitions(extraRow(3L, "2024-02", 7.0),
        root, "m", "ts")
    }
    withSeam(seam) {
      SnapshotStore.appendPartitions(extraRow(4L, "2024-01", 3.0),
        root, "m", "ts")
    }
    assert(totals(root) === Map("2024-01" -> 13.0, "2024-02" -> 17.0))
    // the retry reused its first attempt's dirs: 1 full write + 2
    // appends = 3 snap dirs, no fourth from the re-commit
    val snapDirs = Option(dataDir.listFiles()).get
      .count(f => f.isDirectory && f.getName.startsWith("snap-"))
    assert(snapDirs === 3, "conflict retry must not rewrite data")
    // idempotence tokens survived the conflict retry: replaying the
    // local batch is a no-op
    val id = SnapshotStore.appendPartitions(extraRow(4L, "2024-01", 3.0),
      root, "m", "ts", idempotence = Some(("w1", "b7")))
    assert(SnapshotStore.appendPartitions(extraRow(4L, "2024-01", 3.0),
      root, "m", "ts", idempotence = Some(("w1", "b7"))) === id)
    assert(totals(root)("2024-01") === 16.0) // appended once, not twice
  }

  test("a stale MANIFEST hint repairs forward along the chain: readers " +
      "and the next commit both resolve the true head") {
    val root = tmpRoot("hint")
    SnapshotStore.write(mkRows(10.0), root, "m", "ts")
    SnapshotStore.appendPartitions(extraRow(3L, "2024-01", 5.0),
      root, "m", "ts")
    // simulate a writer that crashed between its chain claim and its
    // hint rename: roll MANIFEST back to the seq-1 manifest
    val m1 = java.nio.file.Paths.get(root, "manifests", "commit-1")
    java.nio.file.Files.copy(m1,
      java.nio.file.Paths.get(root, "MANIFEST"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    // the walk resolves the committed head, not the stale hint
    assert(SnapshotStore.seqOf(SnapshotStore.current(root).get) === 2L)
    assert(totals(root) === Map("2024-01" -> 15.0, "2024-02" -> 10.0))
    // and the next commit bases on the true head (claims slot 3,
    // carrying the appended row — nothing reverted), repairing the hint
    SnapshotStore.appendPartitions(extraRow(4L, "2024-02", 2.0),
      root, "m", "ts")
    assert(SnapshotStore.seqOf(SnapshotStore.current(root).get) === 3L)
    assert(totals(root) === Map("2024-01" -> 15.0, "2024-02" -> 12.0))
  }

  test("a foreign id claim is skipped, never shared: the next commit " +
      "writes its own dir and nothing mixes") {
    val root = tmpRoot("claim")
    SnapshotStore.write(mkRows(10.0), root, "m", "ts")
    // simulate another host's in-flight claim of the next id
    java.nio.file.Files.createDirectory(
      java.nio.file.Paths.get(root, "data", "snap-2"))
    SnapshotStore.appendPartitions(extraRow(3L, "2024-01", 5.0),
      root, "m", "ts")
    // our append claimed snap-3; the foreign claim dir stayed empty
    val appended = SnapshotStore.current(root).get.entries
      .filter(_.dir.startsWith("data/snap-3"))
    assert(appended.nonEmpty, "append must skip the foreign claim")
    assert(Option(new java.io.File(s"$root/data/snap-2").listFiles())
      .getOrElse(Array.empty).isEmpty, "the foreign claim stays untouched")
    assert(totals(root) === Map("2024-01" -> 15.0, "2024-02" -> 10.0))
  }

  test("expire repairs a trailing hint to the live head before " +
      "dropping slots — no stale resolve, no chain fork") {
    val root = tmpRoot("repair")
    SnapshotStore.write(mkRows(10.0), root, "m", "ts")
    SnapshotStore.appendPartitions(extraRow(3L, "2024-01", 5.0),
      root, "m", "ts")
    SnapshotStore.appendPartitions(extraRow(4L, "2024-02", 2.0),
      root, "m", "ts")
    // hint crashes back to seq 1 while slots 2 and 3 exist
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(root, "manifests", "commit-1"),
      java.nio.file.Paths.get(root, "MANIFEST"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    SnapshotStore.expire(root, keepLast = 1)
    // the hint itself now names the head — no walk needed, even though
    // the head's repair slots were dropped by this very expire
    val hintText = java.nio.file.Files.readString(
      java.nio.file.Paths.get(root, "MANIFEST"))
    assert(hintText.contains("prop=commit.seq\t3"),
      s"hint must be repaired to seq 3, got:\n$hintText")
    assert(totals(root) === Map("2024-01" -> 15.0, "2024-02" -> 12.0))
    // and the next commit bases on the head, claiming slot 4 — the
    // freed slot numbers are behind the hint, unreachable for a fork
    SnapshotStore.appendPartitions(extraRow(5L, "2024-01", 1.0),
      root, "m", "ts")
    assert(SnapshotStore.seqOf(SnapshotStore.current(root).get) === 4L)
    assert(totals(root) === Map("2024-01" -> 16.0, "2024-02" -> 12.0))
  }

  test("orphan grace: expire spares unreferenced dirs younger than the " +
      "grace (an in-flight cross-host commit), sweeps them past it") {
    val root = tmpRoot("grace")
    SnapshotStore.write(mkRows(10.0), root, "m", "ts")
    // an unreferenced dir — a crash orphan, or another host's commit
    // still in its data-write phase
    val orphan = java.nio.file.Paths.get(root, "data", "snap-7")
    java.nio.file.Files.createDirectory(orphan)
    SnapshotStore.expire(root, keepLast = 1, orphanGraceMs = 3600000L)
    assert(java.nio.file.Files.exists(orphan),
      "a young orphan inside the grace window must survive")
    SnapshotStore.expire(root, keepLast = 1) // grace 0: sweep now
    assert(!java.nio.file.Files.exists(orphan))
    assert(totals(root) === Map("2024-01" -> 10.0, "2024-02" -> 10.0))
  }

  test("expire TOMBSTONES the chain slots of dropped manifests (name " +
      "claimed forever, content gone) and keeps the live head's; time " +
      "travel within the horizon still works") {
    val root = tmpRoot("expire")
    SnapshotStore.write(mkRows(10.0), root, "m", "ts")
    SnapshotStore.appendPartitions(extraRow(3L, "2024-01", 5.0),
      root, "m", "ts")
    val id3 = SnapshotStore.appendPartitions(extraRow(4L, "2024-02", 2.0),
      root, "m", "ts")
    SnapshotStore.expire(root, keepLast = 2)
    val mdir = java.nio.file.Paths.get(root, "manifests")
    // every slot name persists — sequence numbers are never reusable —
    // but the expired slot is a zero-length tombstone while retained
    // slots keep their manifest content
    for (s <- 1L to 3L)
      assert(java.nio.file.Files.exists(mdir.resolve(s"commit-$s")),
        s"slot commit-$s must never be freed")
    assert(java.nio.file.Files.size(mdir.resolve("commit-1")) === 0L,
      "the expired slot must be a zero-length tombstone")
    assert(java.nio.file.Files.size(mdir.resolve("commit-2")) > 0L)
    assert(java.nio.file.Files.size(mdir.resolve("commit-3")) > 0L)
    // the tombstone is a filesystem-level claim: a writer re-using the
    // freed sequence number dies on the exclusive create, exactly like
    // losing a live race
    intercept[java.nio.file.FileAlreadyExistsException] {
      java.nio.file.Files.createLink(mdir.resolve("commit-1"),
        mdir.resolve("manifest-3"))
    }
    // tombstones re-expire as no-ops, and the walk steps over them
    SnapshotStore.expire(root, keepLast = 2)
    assert(SnapshotStore.seqOf(SnapshotStore.current(root).get) === 3L)
    assert(SnapshotStore.read(spark, root, asOf = Some(id3)).count() === 4L)
    assert(totals(root) === Map("2024-01" -> 15.0, "2024-02" -> 12.0))
  }

  test("a writer whose base predates the retention horizon fails " +
      "LOUDLY — expire can never hand its freed slot numbers to a " +
      "stale commit (the silent-rollback hole)") {
    val root = tmpRoot("stale")
    SnapshotStore.write(mkRows(10.0), root, "m", "ts")
    // inside the stale writer's publish window (base = seq 1): three
    // foreign commits advance the head to seq 4, then expire drops the
    // intermediate manifests — the stale writer's target slot
    // commit-2 is now an expired, tombstoned sequence number
    val seam = onceSeam {
      SnapshotStore.appendPartitions(extraRow(3L, "2024-01", 1.0),
        root, "m", "ts")
      SnapshotStore.appendPartitions(extraRow(4L, "2024-01", 1.0),
        root, "m", "ts")
      SnapshotStore.appendPartitions(extraRow(5L, "2024-01", 1.0),
        root, "m", "ts")
      SnapshotStore.expire(root, keepLast = 1)
    }
    intercept[SnapshotStore.ConcurrentCommitException] {
      withSeam(seam) {
        SnapshotStore.overwritePartitions(
          mkRows(99.0).filter(col("m") === "2024-02"), root, "m", "ts")
      }
    }
    // the head was NOT rolled back: all three foreign appends survive,
    // the hint still names seq 4, and the stale restatement is absent
    assert(SnapshotStore.seqOf(SnapshotStore.current(root).get) === 4L)
    assert(totals(root) === Map("2024-01" -> 13.0, "2024-02" -> 10.0))
    // a fresh retry (new base read) commits cleanly at seq 5
    SnapshotStore.overwritePartitions(
      mkRows(99.0).filter(col("m") === "2024-02"), root, "m", "ts")
    assert(SnapshotStore.seqOf(SnapshotStore.current(root).get) === 5L)
    assert(totals(root)("2024-02") === 99.0)
  }

  test("retention ranks by commit order (chain seq), not manifest id: " +
      "a conflict-retried append's reused id cannot push a NEWER " +
      "commit's manifest out of the horizon") {
    val root = tmpRoot("seqrank")
    SnapshotStore.write(mkRows(10.0), root, "m", "ts") // id 1, seq 1
    // local append allocates id 2, then a foreign append wins the race
    // with id 3 / seq 2; the local retry reuses id 2 and lands at
    // seq 3 — id order (2 < 3) now INVERTS commit order (seq 3 > 2)
    val seam = onceSeam {
      SnapshotStore.appendPartitions(extraRow(3L, "2024-02", 7.0),
        root, "m", "ts")
    }
    withSeam(seam) {
      SnapshotStore.appendPartitions(extraRow(4L, "2024-01", 3.0),
        root, "m", "ts")
    }
    val head = SnapshotStore.current(root).get
    assert(head.id === 2L && SnapshotStore.seqOf(head) === 3L,
      "precondition: the retried append must reuse id 2 at seq 3")
    SnapshotStore.appendPartitions(extraRow(5L, "2024-01", 1.0),
      root, "m", "ts") // id 4, seq 4
    SnapshotStore.expire(root, keepLast = 2)
    val mdir = java.nio.file.Paths.get(root, "manifests")
    // the two NEWEST COMMITS survive: seq 3 (id 2) and seq 4 (id 4);
    // id-ranked retention would have kept id 3 (seq 2, older) and
    // dropped id 2 (seq 3, newer)
    assert(java.nio.file.Files.exists(mdir.resolve("manifest-2")),
      "the newer commit's manifest (lower id) must be retained")
    assert(!java.nio.file.Files.exists(mdir.resolve("manifest-3")),
      "the older commit's manifest (higher id) must expire")
    assert(SnapshotStore.read(spark, root, asOf = Some(2L)).count() === 4L)
    assert(totals(root) ===
      Map("2024-01" -> 14.0, "2024-02" -> 17.0))
  }

  test("a replayed batch is recognized under a LEGACY writer-id alias " +
      "slot, and new commits record only the canonical slot") {
    val root = tmpRoot("alias")
    SnapshotStore.write(mkRows(10.0), root, "m", "ts")
    // the pre-upgrade pipeline recorded batch 5 under the raw spelling
    SnapshotStore.appendPartitions(extraRow(3L, "2024-01", 5.0),
      root, "m", "ts", idempotence = Some(("./ckpt/", "5")))
    // post-upgrade: canonical id, raw spelling passed as alias — the
    // re-delivered batch 5 is a no-op, not a double append
    val idReplay = SnapshotStore.appendPartitions(
      extraRow(3L, "2024-01", 5.0), root, "m", "ts",
      idempotence = Some(("/abs/ckpt", "5")),
      idempotenceAliases = Seq("./ckpt/"))
    assert(idReplay === SnapshotStore.current(root).get.id)
    assert(totals(root)("2024-01") === 15.0, "replay must not re-append")
    // the next batch commits normally and lands in the canonical slot
    SnapshotStore.appendPartitions(extraRow(4L, "2024-01", 2.0),
      root, "m", "ts", idempotence = Some(("/abs/ckpt", "6")),
      idempotenceAliases = Seq("./ckpt/"))
    assert(totals(root)("2024-01") === 17.0)
    val props = SnapshotStore.current(root).get.props
    assert(props.get(SnapshotStore.AppendTokenPrefix + "/abs/ckpt")
      === Some("6"))
    // the legacy slot still holds its last pre-upgrade token (ages out
    // by irrelevance, never erased)
    assert(props.get(SnapshotStore.AppendTokenPrefix + "./ckpt/")
      === Some("5"))
  }

  test("hard-link capability probe: confirms support on this " +
      "filesystem and leaves no scratch files behind") {
    val root = tmpRoot("probe")
    SnapshotStore.write(mkRows(1.0), root, "m", "ts")
    assert(SnapshotStore.supportsHardLinks(root),
      "this test filesystem supports link(2); the probe must agree")
    val s = java.nio.file.Files.list(
      java.nio.file.Paths.get(root, "manifests"))
    val leftovers =
      try {
        val it = s.iterator()
        val buf = scala.collection.mutable.ArrayBuffer[String]()
        while (it.hasNext) buf += it.next().getFileName.toString
        buf.filter(_.startsWith(".linkprobe"))
      } finally s.close()
    assert(leftovers.isEmpty, s"probe scratch files leaked: $leftovers")
  }

  test("history falls back to the manifests listing for a table with " +
      "no chain slots (degraded no-hard-link / pre-chain legacy)") {
    val root = tmpRoot("legacyhist")
    SnapshotStore.write(mkRows(10.0), root, "m", "ts")
    SnapshotStore.appendPartitions(extraRow(3L, "2024-01", 1.0),
      root, "m", "ts")
    val chained = SnapshotStore.history(root)
    assert(chained.size === 2)
    // simulate a degraded/legacy table: no commit-* slots at all
    val dir = java.nio.file.Paths.get(root, "manifests")
    val s = java.nio.file.Files.list(dir)
    try {
      val it = s.iterator()
      while (it.hasNext) {
        val p = it.next()
        if (p.getFileName.toString.startsWith("commit-"))
          java.nio.file.Files.delete(p)
      }
    } finally s.close()
    assert(SnapshotStore.retainedSeqs(root).isEmpty)
    val fallback = SnapshotStore.history(root)
    assert(fallback.map(h => (h.seq, h.id, h.entries, h.rows)) ===
      chained.map(h => (h.seq, h.id, h.entries, h.rows)),
      "the manifests-listing fallback must reproduce the chain view")
    // reads still resolve through the hint
    assert(totals(root)("2024-01") === 11.0)
  }

  test("an append under a different session timezone on a " +
      "TZ-timestamp-partitioned table refuses loudly; a string " +
      "partition column is indifferent to the zone") {
    import spark.implicits._
    val root = tmpRoot("tzguard")
    val rows = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-15 10:00:00"), 1),
      (2L, java.sql.Timestamp.valueOf("2024-02-15 10:00:00"), 2))
      .toDF("id", "ts", "v")
    SnapshotStore.write(rows, root, partCol = "ts", sortCol = "v")
    val tz0 = spark.conf.get("spark.sql.session.timeZone")
    assert(SnapshotStore.current(root).get.props
      .get(SnapshotStore.TzProp) === Some(tz0),
      "every commit must record the writer session's timezone")
    val other =
      if (tz0 == "Asia/Tokyo") "America/New_York" else "Asia/Tokyo"
    spark.conf.set("spark.sql.session.timeZone", other)
    try {
      val e = intercept[IllegalArgumentException] {
        SnapshotStore.appendPartitions(
          Seq((3L, java.sql.Timestamp.valueOf("2024-03-15 10:00:00"), 3))
            .toDF("id", "ts", "v"), root, "ts", "v")
      }
      assert(e.getMessage.contains("timezone"))
      // a string-partitioned table appends fine under any zone
      val sroot = tmpRoot("tzstring")
      SnapshotStore.write(mkRows(10.0), sroot, "m", "ts")
      SnapshotStore.appendPartitions(extraRow(3L, "2024-01", 1.0),
        sroot, "m", "ts")
      assert(totals(sroot)("2024-01") === 11.0)
    } finally spark.conf.set("spark.sql.session.timeZone", tz0)
    // back under the writer zone the append goes through
    SnapshotStore.appendPartitions(
      Seq((3L, java.sql.Timestamp.valueOf("2024-03-15 10:00:00"), 3))
        .toDF("id", "ts", "v"), root, "ts", "v")
    assert(SnapshotStore.read(spark, root).count() === 3L)
  }
}
