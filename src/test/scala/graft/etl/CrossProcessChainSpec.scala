package graft.etl

import graft.SparkSpec

/** REAL multi-process writer stress: three separate JVMs (not threads,
  * not a seam — `ProcessBuilder`-spawned OS processes with their own
  * SparkSessions and their own file-lock state) concurrently append to
  * one snapshot table through the public API, while this JVM reads.
  * Proves the same-host half of the writer-coordination story end to
  * end: commits from independent processes serialize on the
  * `.commit.lock` FileLock, every batch lands exactly once, and the
  * commit chain comes out dense with no conflict ever surfacing to a
  * caller. (The cross-HOST half — FileLock absent, chain CAS alone —
  * is driven deterministically in `CommitChainSpec` via the publish
  * seam; one sandbox cannot span two hosts.) */
class CrossProcessChainSpec extends SparkSpec {

  test("three OS processes append concurrently through the public API: " +
      "every batch lands exactly once, the chain is dense, a live " +
      "reader never errors") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_xproc").toString + "/t"
    SnapshotStore.write(
      Seq(("seed-1", "2024-01", 0), ("seed-2", "2024-02", 0))
        .toDF("k", "m", "v"),
      root, partCol = "m", sortCol = "v")

    val javaBin = s"${sys.props("java.home")}/bin/java"
    // the forked test JVM's classpath IS the full test classpath
    // (Test/fork := true), so children get exactly our classes + Spark
    val cp = sys.props("java.class.path")
    // mirror build.sbt's jdk17AddOpens — Spark 4 on JDK 17 outside
    // spark-submit needs the module opens injected by hand
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar",
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val nWorkers = 3
    val nBatches = 4
    val procs = (1 to nWorkers).map { w =>
      val cmd = (Seq(javaBin, "-Xmx2g") ++ addOpens ++
        Seq("-cp", cp, "graft.etl.ChainStressWorker",
          root, s"w$w", nBatches.toString)).toArray
      new ProcessBuilder(cmd: _*)
        .redirectErrorStream(true)
        .redirectOutput(ProcessBuilder.Redirect.DISCARD)
        .start()
    }
    // a live reader polls while the workers commit: every resolve must
    // parse cleanly and row counts must only grow (prefix visibility)
    var lastCount = 0L
    var readerError: Throwable = null
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val reader = new Thread(() => {
      try {
        while (!stop.get()) {
          val n = SnapshotStore.read(spark, root).count()
          assert(n >= lastCount, s"row count went backwards: $lastCount -> $n")
          lastCount = n
          Thread.sleep(200)
        }
      } catch { case t: Throwable => readerError = t }
    })
    reader.start()
    try procs.foreach { p =>
      assert(p.waitFor(300, java.util.concurrent.TimeUnit.SECONDS),
        "worker timed out")
      assert(p.exitValue() === 0, "worker failed — check its stderr")
    } finally { stop.set(true); reader.join(30000) }
    assert(readerError == null, String.valueOf(readerError))

    // exactly once: seed + every (worker, batch, row) key, no dupes
    val rows = SnapshotStore.read(spark, root)
    assert(rows.count() === 2L + nWorkers * nBatches * 2)
    assert(rows.select("k").distinct().count() === rows.count())
    // the chain is dense: one slot per commit, no gaps, seq = head
    val head = SnapshotStore.current(root).get
    val nCommits = 1L + nWorkers * nBatches
    assert(SnapshotStore.seqOf(head) === nCommits)
    (1L to nCommits).foreach { s =>
      assert(java.nio.file.Files.exists(
        java.nio.file.Paths.get(root, "manifests", s"commit-$s")),
        s"chain slot commit-$s missing")
    }
  }

  test("three OS processes append while THIS JVM races expire + a live " +
      "reader: nothing lost, slot names persist as tombstones, the " +
      "retained horizon stays readable") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_xprocexp").toString + "/t"
    SnapshotStore.write(
      Seq(("seed-1", "2024-01", 0), ("seed-2", "2024-02", 0))
        .toDF("k", "m", "v"),
      root, partCol = "m", sortCol = "v")

    val javaBin = s"${sys.props("java.home")}/bin/java"
    val cp = sys.props("java.class.path")
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar",
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val nWorkers = 3
    val nBatches = 4
    val procs = (1 to nWorkers).map { w =>
      val cmd = (Seq(javaBin, "-Xmx2g") ++ addOpens ++
        Seq("-cp", cp, "graft.etl.ChainStressWorker",
          root, s"w$w", nBatches.toString)).toArray
      new ProcessBuilder(cmd: _*)
        .redirectErrorStream(true)
        .redirectOutput(ProcessBuilder.Redirect.DISCARD)
        .start()
    }
    // expire races the writers: repairs the hint, tombstones dropped
    // slots, sweeps orphans — all under the same file lock the worker
    // processes serialize on
    var expireError: Throwable = null
    var lastCount = 0L
    var readerError: Throwable = null
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    // keepLast = 5 while writers are live: the lock-free reader
    // resolves a head and then scans it — enough horizon that a scan
    // straddling a few fresh commits never has its dirs swept
    val expirer = new Thread(() => {
      try while (!stop.get()) {
        SnapshotStore.expire(root, keepLast = 5)
        Thread.sleep(250)
      } catch { case t: Throwable => expireError = t }
    })
    val reader = new Thread(() => {
      try while (!stop.get()) {
        val n = SnapshotStore.read(spark, root).count()
        assert(n >= lastCount, s"row count went backwards: $lastCount -> $n")
        lastCount = n
        Thread.sleep(200)
      } catch { case t: Throwable => readerError = t }
    })
    expirer.start(); reader.start()
    try procs.foreach { p =>
      assert(p.waitFor(300, java.util.concurrent.TimeUnit.SECONDS),
        "worker timed out")
      assert(p.exitValue() === 0, "worker failed — check its stderr")
    } finally { stop.set(true); expirer.join(30000); reader.join(30000) }
    assert(expireError == null, s"expire raced into: $expireError")
    assert(readerError == null, String.valueOf(readerError))

    // nothing lost despite the rolling horizon: exactly-once content
    val rows = SnapshotStore.read(spark, root)
    assert(rows.count() === 2L + nWorkers * nBatches * 2)
    assert(rows.select("k").distinct().count() === rows.count())
    val nCommits = 1L + nWorkers * nBatches
    val head = SnapshotStore.current(root).get
    assert(SnapshotStore.seqOf(head) === nCommits,
      "the head seq must count every commit — expire never forks")
    // every slot NAME persists (sequence numbers are never reusable);
    // expired ones are zero-length tombstones, and a final expire
    // leaves exactly keepLast parseable manifests in the history
    (1L to nCommits).foreach { s =>
      assert(java.nio.file.Files.exists(
        java.nio.file.Paths.get(root, "manifests", s"commit-$s")),
        s"slot commit-$s vanished — a stale writer could reuse it")
    }
    SnapshotStore.expire(root, keepLast = 3)
    val hist = SnapshotStore.history(root)
    assert(hist.size === 3, s"retention must keep 3, got $hist")
    assert(hist.last.seq === nCommits)
    assert(hist.map(_.seq) === hist.map(_.seq).sorted)
    // the newest retained commits are time-travel readable
    assert(SnapshotStore.read(spark, root,
      asOf = Some(hist.head.id)).count() >= 2L)
  }
}
