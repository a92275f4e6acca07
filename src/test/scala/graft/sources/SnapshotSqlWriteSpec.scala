package graft.sources

import graft.SparkSpec
import graft.etl.SnapshotStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
import org.apache.spark.sql.functions._

/** The SQL WRITE surface over snapshot tables: INSERT INTO as an
  * atomic append commit, `CALL system.merge_into` as the locked
  * copy-on-write MERGE, manifest row counts in scan statistics, and
  * namespace listing. */
class SnapshotSqlWriteSpec extends SparkSpec {

  import spark.implicits._

  private def mkRows(febPrice: Double) = Seq(
    (1L, "2024-01", java.sql.Timestamp.valueOf("2024-01-03 00:00:00"), 10.0),
    (2L, "2024-01", java.sql.Timestamp.valueOf("2024-01-20 00:00:00"), 20.0),
    (3L, "2024-02", java.sql.Timestamp.valueOf("2024-02-05 00:00:00"), febPrice),
    (4L, "2024-02", java.sql.Timestamp.valueOf("2024-02-25 00:00:00"), febPrice))
    .toDF("id", "m", "ts", "price")

  private def mkTable(tag: String): (String, String) = {
    val wh = java.nio.file.Files
      .createTempDirectory(s"graft_snapw_$tag").toString
    SnapshotStore.write(mkRows(30.0), s"$wh/trips", "m", "ts")
    (wh, "trips")
  }

  private def register(cat: String, wh: String): Unit = {
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[GraftSnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
  }

  test("INSERT INTO lands an atomic snapshot append; SQL and Scala " +
      "reads agree; the layout comes from the manifest props") {
    val (wh, name) = mkTable("ins")
    register("snapw", wh)
    val before = SnapshotStore.current(s"$wh/$name").get
    spark.sql(s"INSERT INTO snapw.$name VALUES " +
      "(9, '2024-03', TIMESTAMP '2024-03-01 00:00:00', 5.5)," +
      "(10, '2024-01', TIMESTAMP '2024-01-31 00:00:00', 7.5)")
    val after = SnapshotStore.current(s"$wh/$name").get
    assert(after.id > before.id)
    // append never drops: prior entries all carried forward
    assert(before.entries.map(_.dir).toSet.subsetOf(
      after.entries.map(_.dir).toSet))
    val got = spark.sql(
      s"SELECT m, count(*) AS n, sum(price) AS s FROM snapw.$name GROUP BY m")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === Set(("2024-01", 3L, 37.5), ("2024-02", 2L, 60.0),
      ("2024-03", 1L, 5.5)))
    // SQL read == Scala read
    assert(spark.sql(s"SELECT * FROM snapw.$name").count() ===
      SnapshotStore.read(spark, s"$wh/$name").count())
    // INSERT OVERWRITE, dynamic mode: restates EXACTLY the partitions
    // present in the query — other months carry by dir reference.
    // Mode scoped through a SESSION CLONE, never by mutating the
    // shared session's conf (set/restore leaks to concurrent jobs).
    val dyn = org.apache.spark.sql.GraftPlanBridge.sessionWithConf(
      spark, "spark.sql.sources.partitionOverwriteMode" -> "dynamic")
    val preOw = SnapshotStore.current(s"$wh/$name").get
    dyn.sql(s"INSERT OVERWRITE snapw.$name VALUES " +
      "(99, '2024-03', TIMESTAMP '2024-09-01 00:00:00', 1.0)")
    val postOw = SnapshotStore.current(s"$wh/$name").get
    def dirs(m: SnapshotStore.Manifest, v: String) =
      m.entries.filter(_.value == v).map(_.dir).toSet
    assert(dirs(postOw, "2024-01") === dirs(preOw, "2024-01"),
      "dynamic overwrite must carry untouched months by reference")
    assert(dirs(postOw, "2024-02") === dirs(preOw, "2024-02"))
    assert(dirs(postOw, "2024-03") !== dirs(preOw, "2024-03"))
    assert(spark.sql(
      s"SELECT count(*), sum(price) FROM snapw.$name WHERE m = '2024-03'")
      .head() === org.apache.spark.sql.Row(1L, 1.0))
    assert(spark.sql(s"SELECT count(*) FROM snapw.$name")
      .head().getLong(0) === 6L)
    // STATIC mode (the Spark default): the whole table is replaced
    // by the query result, as one fresh snapshot — history intact
    val sta = org.apache.spark.sql.GraftPlanBridge.sessionWithConf(
      spark, "spark.sql.sources.partitionOverwriteMode" -> "static")
    sta.sql(s"INSERT OVERWRITE snapw.$name VALUES " +
      "(7, '2024-05', TIMESTAMP '2024-05-01 00:00:00', 2.0)")
    assert(spark.sql(s"SELECT m, count(*) FROM snapw.$name GROUP BY m")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet ===
      Set(("2024-05", 1L)))
    assert(SnapshotStore.read(spark, s"$wh/$name",
      asOf = Some(postOw.id)).count() === 6L,
      "pre-overwrite snapshots stay time-travelable")
  }

  test("CALL system.history lists the retained commits ascending with " +
      "entry counts and stats-backed row totals") {
    val (wh, name) = mkTable("hist")
    register("snaph", wh)
    val root = s"$wh/$name"
    spark.sql(s"INSERT INTO snaph.$name VALUES " +
      "(9, '2024-03', TIMESTAMP '2024-03-01 00:00:00', 5.5)")
    spark.sql(s"DELETE FROM snaph.$name WHERE m = '2024-01'")
    val rows = spark.sql(s"CALL snaph.system.history('$name')")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
    assert(rows.map(_._1).toSeq === Seq(1L, 2L, 3L), s"got ${rows.toSeq}")
    // write: 2 months; insert: +1 part; delete: -the 2024-01 entries
    assert(rows(0)._3 === 2 && rows(1)._3 === 3 && rows(2)._3 === 2)
    // every entry carries write-time stats → exact totals
    assert(rows.map(_._4).toSeq === Seq(4L, 5L, 3L))
    // ids match the Scala history API
    assert(SnapshotStore.history(root).map(_.id) ===
      rows.map(_._2).toSeq)
    intercept[Exception] {
      spark.sql("CALL snaph.system.history('no_such_table')")
    }
  }

  test("readStream.table through the catalog tails the commit chain " +
      "like the path-addressed reader") {
    val (wh, name) = mkTable("ct")
    register("snapst", wh)
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_ct_ck").toString
    val sink = scala.collection.mutable.ArrayBuffer[Long]()
    def drainOnce(): Unit = {
      val q = spark.readStream.table(s"snapst.$name")
        .writeStream
        .foreachBatch {
          (df: org.apache.spark.sql.DataFrame, _: Long) =>
            sink.synchronized { sink ++= df.collect().map(_.getLong(0)) }
            ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drainOnce()
    assert(sink.sorted === Seq(1L, 2L, 3L, 4L))
    spark.sql(s"INSERT INTO snapst.$name VALUES " +
      "(9, '2024-03', TIMESTAMP '2024-03-01 00:00:00', 5.5)")
    drainOnce()
    assert(sink.sorted === Seq(1L, 2L, 3L, 4L, 9L),
      "only the SQL-INSERTed commit arrives on restart")
  }

  test("CALL system.compact folds parts to one dir per partition and " +
      "CALL system.expire bounds the history — the full operational " +
      "surface from SQL") {
    val (wh, name) = mkTable("ops")
    register("snapo", wh)
    val root = s"$wh/$name"
    spark.sql(s"INSERT INTO snapo.$name VALUES " +
      "(9, '2024-01', TIMESTAMP '2024-01-09 00:00:00', 5.5)")
    assert(SnapshotStore.current(root).get.entries.size === 3,
      "the append accumulates a second part for 2024-01")
    val sumBefore = spark.sql(s"SELECT sum(price) FROM snapo.$name")
      .head().getDouble(0)
    val cid = spark.sql(s"CALL snapo.system.compact('$name')")
      .head().getLong(0)
    val afterCompact = SnapshotStore.current(root).get
    assert(afterCompact.id === cid)
    assert(afterCompact.entries.size === 2,
      "compaction folds to one dir per partition")
    assert(spark.sql(s"SELECT sum(price) FROM snapo.$name")
      .head().getDouble(0) === sumBefore, "content unchanged")
    val retained = spark.sql(s"CALL snapo.system.expire('$name', 1)")
      .head().getLong(0)
    assert(retained === 1L)
    assert(SnapshotStore.history(root).map(_.id) === Seq(cid))
    assert(spark.sql(s"SELECT count(*) FROM snapo.$name")
      .head().getLong(0) === 5L, "the live head survives expire")
    intercept[IllegalArgumentException] {
      spark.sql(s"CALL snapo.system.expire('$name', 0)")
    }
  }

  test("CALL system.rollback restores a retained commit as a NEW head: " +
      "content reverts, history stays append-only, rolled-back commits " +
      "stay time-travel-visible, no-op at head, loud past the horizon, " +
      "and a rolled-back stream batch re-delivered stays a no-op") {
    import spark.implicits._
    val (wh, name) = mkTable("rb")
    register("snaprb", wh)
    val root = s"$wh/$name"
    val sum0 = spark.sql(s"SELECT sum(price) FROM snaprb.$name")
      .head().getDouble(0)
    // seq 2: an idempotent streaming-style append; seq 3: a DELETE
    SnapshotStore.appendPartitions(
      Seq((9L, "2024-03", java.sql.Timestamp.valueOf("2024-03-01 00:00:00"),
        5.5)).toDF("id", "m", "ts", "price"),
      root, "m", "ts", idempotence = Some(("ckpt_rb", "5")))
    spark.sql(s"DELETE FROM snaprb.$name WHERE m = '2024-01'")
    val badHead = SnapshotStore.current(root).get
    assert(SnapshotStore.currentSeq(root) === 3L)
    // restore seq 1 as a NEW commit (seq 4)
    val rid = spark.sql(s"CALL snaprb.system.rollback('$name', 1)")
      .head().getLong(0)
    assert(SnapshotStore.currentSeq(root) === 4L,
      "rollback publishes a new head, never rewinds the chain")
    assert(SnapshotStore.current(root).get.id === rid)
    assert(spark.sql(s"SELECT sum(price) FROM snaprb.$name")
      .head().getDouble(0) === sum0, "content reverted to seq 1")
    assert(SnapshotStore.history(root).map(_.seq) === Seq(1L, 2L, 3L, 4L))
    // the rolled-back state is still time-travel-visible
    assert(SnapshotStore.read(spark, root, asOf = Some(badHead.id))
      .count() === 3L)
    // a re-delivered copy of the rolled-back stream batch is STILL a
    // replay: the restore keeps the head's idempotence tokens
    val idAfter = SnapshotStore.appendPartitions(
      Seq((9L, "2024-03", java.sql.Timestamp.valueOf("2024-03-01 00:00:00"),
        5.5)).toDF("id", "m", "ts", "price"),
      root, "m", "ts", idempotence = Some(("ckpt_rb", "5")))
    assert(idAfter === rid, "the replay must not re-append")
    assert(spark.sql(s"SELECT sum(price) FROM snaprb.$name")
      .head().getDouble(0) === sum0)
    // no-op: rolling back to the current head commits nothing
    spark.sql(s"CALL snaprb.system.rollback('$name', 4)")
    assert(SnapshotStore.currentSeq(root) === 4L)
    assert(SnapshotStore.current(root).get.id === rid)
    // out of range / expired targets fail loudly
    intercept[IllegalArgumentException] {
      spark.sql(s"CALL snaprb.system.rollback('$name', 99)")
    }
    SnapshotStore.expire(root, keepLast = 1)
    val e = intercept[IllegalStateException] {
      spark.sql(s"CALL snaprb.system.rollback('$name', 2)")
    }
    assert(e.getMessage.contains("expired"))
  }

  test("CALL system.history and system.expire report the manifests " +
      "listing for a table with no chain slots (degraded/legacy) " +
      "instead of an empty history / retained_commits = 0") {
    val (wh, name) = mkTable("deg")
    register("snapdeg", wh)
    val root = s"$wh/$name"
    spark.sql(s"INSERT INTO snapdeg.$name VALUES " +
      "(9, '2024-03', TIMESTAMP '2024-03-01 00:00:00', 5.5)")
    // simulate a degraded no-hard-link / pre-chain table
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
    val hist = spark.sql(s"CALL snapdeg.system.history('$name')")
      .collect()
    assert(hist.length === 2,
      "both commits surface through the manifests-listing fallback")
    val retained = spark.sql(s"CALL snapdeg.system.expire('$name', 1)")
      .head().getLong(0)
    assert(retained === 1L,
      "expire reports the retained manifest count, not 0")
    assert(spark.sql(s"SELECT count(*) FROM snapdeg.$name")
      .head().getLong(0) === 5L, "the live head survives")
  }

  test("a time-travel load is read-only: INSERT into VERSION AS OF " +
      "cannot resolve a writable table") {
    val (wh, name) = mkTable("tt")
    register("snaptt", wh)
    val id1 = SnapshotStore.current(s"$wh/$name").get.id
    // version-as-of INSERT isn't even parseable as a write target in
    // Spark SQL; the equivalent API-level hole would be a writable
    // time-travel table — assert the capability is absent
    val t = new GraftSnapshotCatalog()
    t.initialize("x", new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Map.of("warehouse", wh)))
    val loaded = t.loadTable(
      org.apache.spark.sql.connector.catalog.Identifier.of(
        Array.empty[String], name), id1.toString)
    assert(!loaded.capabilities().contains(
      org.apache.spark.sql.connector.catalog.TableCapability.V1_BATCH_WRITE))
    assert(loaded.capabilities().contains(
      org.apache.spark.sql.connector.catalog.TableCapability.BATCH_READ))
  }

  test("CALL system.merge_into applies update/delete/insert as one " +
      "locked commit and returns the snapshot id") {
    val (wh, name) = mkTable("call")
    register("snapc", wh)
    Seq(
      (3L, "2024-02", java.sql.Timestamp.valueOf("2024-02-05 00:00:00"),
        111.0, false), // update
      (1L, "2024-01", java.sql.Timestamp.valueOf("2024-01-03 00:00:00"),
        0.0, true), // delete
      (7L, "2024-03", java.sql.Timestamp.valueOf("2024-03-07 00:00:00"),
        77.0, false)) // insert
      .toDF("id", "m", "ts", "price", "_del")
      .createOrReplaceTempView("merge_changes_v")
    val res = spark.sql(
      s"CALL snapc.system.merge_into('$name', 'merge_changes_v', 'id', '_del')")
      .collect()
    val committed = SnapshotStore.current(s"$wh/$name").get.id
    assert(res.map(_.getLong(0)).toSeq === Seq(committed))
    val got = spark.sql(s"SELECT id, price FROM snapc.$name")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got === Map(2L -> 20.0, 3L -> 111.0, 4L -> 30.0, 7L -> 77.0))
  }

  test("an unfiltered scan reports the manifest's exact row count; a " +
      "filtered scan falls back to the file-size estimate") {
    val (wh, name) = mkTable("stats")
    def scanStats(df: DataFrame) =
      df.queryExecution.optimizedPlan.collect {
        case r: DataSourceV2ScanRelation => r.computeStats()
      }.head
    val full = spark.read.format("graft-snapshot").load(s"$wh/$name")
    assert(scanStats(full).rowCount === Some(BigInt(4)))
    val filtered = spark.read.format("graft-snapshot").load(s"$wh/$name")
      .filter(col("price") > 25.0)
    // pushed filter → manifest count would overestimate → no exact claim
    assert(scanStats(filtered).rowCount.isEmpty)
    // pushdown itself is intact through the stats scan (inherited
    // ParquetScanBuilder — nothing proxied away)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(price), GreaterThan(price,25.0)"),
      s"filter did not reach the parquet scan:\n$plan")
  }

  test("namespaces: SHOW NAMESPACES lists warehouse subdirs, nested " +
      "tables resolve and accept DML") {
    val wh = java.nio.file.Files.createTempDirectory("graft_snapw_ns").toString
    SnapshotStore.write(mkRows(30.0), s"$wh/raw/trips", "m", "ts")
    SnapshotStore.write(mkRows(40.0), s"$wh/toplevel", "m", "ts")
    register("snapns", wh)
    val namespaces = spark.sql("SHOW NAMESPACES IN snapns")
      .collect().map(_.getString(0)).toSet
    assert(namespaces === Set("raw"))
    val tables = spark.sql("SHOW TABLES IN snapns.raw")
      .collect().map(_.getString(1)).toSet
    assert(tables === Set("trips"))
    spark.sql("INSERT INTO snapns.raw.trips VALUES " +
      "(11, '2024-04', TIMESTAMP '2024-04-01 00:00:00', 4.0)")
    assert(spark.sql("SELECT count(*) AS n FROM snapns.raw.trips")
      .head().getLong(0) === 5L)
    // unknown namespace is a proper error
    val e = intercept[Exception] {
      spark.sql("SHOW TABLES IN snapns.nope").collect()
    }
    assert(String.valueOf(e.getMessage).toLowerCase.contains("namespace") ||
      String.valueOf(e.getMessage).toLowerCase.contains("schema"),
      s"unexpected failure shape: $e")
  }
}
