package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** `TIMESTAMP AS OF` over snapshot tables: every commit stamps its
  * wall time in the manifest; resolution picks the LATEST retained
  * commit at-or-before the asked instant
  * ([[SnapshotStore.manifestAtTime]]) and refuses loudly outside the
  * stamped range. */
class SnapshotTimeTravelTsSpec extends SparkSpec {

  import spark.implicits._

  private def mkRoot(tag: String): String = java.nio.file.Files
    .createTempDirectory(s"graft_tstravel_$tag").toString

  /** Three commits with strictly increasing wall stamps. */
  private def threeCommits(root: String): Seq[(Long, Long)] = {
    def pause(): Unit = {
      val t = SnapshotStore.current(root).get.ts.get
      while (System.currentTimeMillis() <= t) Thread.sleep(1L)
    }
    SnapshotStore.write(Seq((1L, "2024-01", 10.0))
      .toDF("id", "m", "price"), root, "m", "id")
    pause()
    SnapshotStore.appendPartitions(Seq((2L, "2024-01", 20.0))
      .toDF("id", "m", "price"), root, "m", "id")
    pause()
    SnapshotStore.appendPartitions(Seq((3L, "2024-02", 30.0))
      .toDF("id", "m", "price"), root, "m", "id")
    SnapshotStore.retainedSeqs(root).map { s =>
      val m = SnapshotStore.manifestAtSeq(root, s)
      (m.id, m.ts.get)
    }
  }

  test("resolution picks the latest commit at-or-before the instant; " +
      "outside the stamped range fails loudly") {
    val root = mkRoot("resolve")
    val commits = threeCommits(root)
    assert(commits.map(_._2) === commits.map(_._2).sorted,
      "stamps must be monotone under the guard")
    def rowsAt(ts: Long): Set[Long] = {
      val m = SnapshotStore.manifestAtTime(root, ts)
      SnapshotStore.read(spark, root, asOf = Some(m.id))
        .select(col("id")).as[Long].collect().toSet
    }
    val Seq((_, t1), (_, t2), (_, t3)) = commits
    assert(rowsAt(t1) === Set(1L), "exactly at the first stamp")
    assert(rowsAt(t2 - 1) === Set(1L), "just before the second")
    assert(rowsAt(t2) === Set(1L, 2L))
    assert(rowsAt(t3 + 60000) === Set(1L, 2L, 3L), "future = head")
    val e = intercept[IllegalStateException](
      SnapshotStore.manifestAtTime(root, t1 - 1))
    assert(e.getMessage.contains("no retained commit at or before"))
  }

  test("SQL TIMESTAMP AS OF through the catalog is read-only and " +
      "resolves like the Scala API") {
    val wh = mkRoot("sqlwh")
    val root = s"$wh/t"
    val Seq((_, t1), _, (_, t3)) = threeCommits(root)
    spark.conf.set("spark.sql.catalog.tstrav",
      classOf[graft.sources.GraftSnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.tstrav.warehouse", wh)
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
      .withZone(java.time.ZoneOffset.UTC)
    def lit(t: Long): String = fmt.format(java.time.Instant.ofEpochMilli(t))
    val got1 = spark.sql(s"SELECT id FROM tstrav.t " +
      s"TIMESTAMP AS OF '${lit(t1)}'").as[Long].collect().toSet
    assert(got1 === Set(1L))
    val got3 = spark.sql(s"SELECT id FROM tstrav.t " +
      s"TIMESTAMP AS OF '${lit(t3)}'").as[Long].collect().toSet
    assert(got3 === Set(1L, 2L, 3L))
    // the resolved table is a read-only (pinned) load, like VERSION AS
    // OF — the write-refusal itself is pinned by the merge/DML specs
    val cat = spark.sessionState.catalogManager
      .catalog("tstrav").asInstanceOf[graft.sources.GraftSnapshotCatalog]
    val tbl = cat.loadTable(
      org.apache.spark.sql.connector.catalog.Identifier.of(
        Array.empty[String], "t"), t1 * 1000L)
    assert(!tbl.asInstanceOf[graft.sources.GraftSnapshotTable].writable)
  }

  test("history exposes commit wall times; the CDF composes with " +
      "TIMESTAMP AS OF via startingTimestamp (changes strictly after)") {
    val wh = mkRoot("cdfwh")
    val root = s"$wh/t"
    val Seq((_, t1), (_, t2), (_, t3)) = threeCommits(root)
    // history: seq-aligned, monotone, non-null stamps
    val hist = SnapshotStore.history(root)
    assert(hist.map(_.ts) === Seq(Some(t1), Some(t2), Some(t3)))
    spark.conf.set("spark.sql.catalog.cdfts",
      classOf[graft.sources.GraftSnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.cdfts.warehouse", wh)
    val sqlTs = spark.sql("CALL cdfts.system.history('t')")
      .select("commit_ts").collect().map(_.getTimestamp(0).getTime)
    assert(sqlTs.toSeq === Seq(t1, t2, t3),
      "CALL history must report the same stamps in micros→ms")
    // state AS OF t1 (+) changes after t1 == the head: the feed from
    // startingTimestamp=t1 must emit EXACTLY commits 2 and 3 (ids 2,3)
    val changed = spark.read.format("graft-snapshot")
      .option("readChangeFeed", "true")
      .option("startingTimestamp", t1.toString)
      .load(root)
      .select(col("id"), col("_change_type")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(changed === Set((2L, "insert"), (3L, "insert")))
    // an instant before the table bounds at seq 0: everything
    val all = spark.read.format("graft-snapshot")
      .option("readChangeFeed", "true")
      .option("startingTimestamp", (t1 - 60000).toString)
      .load(root).count()
    assert(all === 3L)
    // both spellings of a bound refuse together
    val e = intercept[Exception](spark.read.format("graft-snapshot")
      .option("readChangeFeed", "true")
      .option("startingSeq", "1")
      .option("startingTimestamp", t1.toString)
      .load(root).count())
    assert(e.getMessage.contains("not both"))
  }

  test("timestamp bounds accept a bare yyyy-MM-dd (midnight UTC) and " +
      "name the option + accepted formats on a parse failure") {
    val root = mkRoot("dateonly")
    threeCommits(root)
    // a date-only bound strictly after every stamp resolves to the
    // head: the feed from it is empty (all commits are ≤ the bound)
    val tomorrow = java.time.LocalDate.now(java.time.ZoneOffset.UTC)
      .plusDays(2).toString
    val none = spark.read.format("graft-snapshot")
      .option("readChangeFeed", "true")
      .option("startingTimestamp", tomorrow)
      .load(root).count()
    assert(none === 0L, "a post-head date bound must emit nothing")
    // garbage bounds fail with the option name and the accepted forms,
    // not a raw DateTimeParseException
    val e = intercept[Exception](spark.read.format("graft-snapshot")
      .option("readChangeFeed", "true")
      .option("startingTimestamp", "03/15/2024")
      .load(root).count())
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("startingTimestamp") && msg.contains("yyyy-MM-dd"),
      s"parse failure must name the option and formats, got: $msg")
  }

  test("an expired timestamp bound fails LOUDLY instead of silently " +
      "replaying the whole table; a pre-table instant still bounds " +
      "at everything") {
    val root = mkRoot("expired")
    val Seq((_, t1), (_, t2), _) = threeCommits(root)
    // pre-table instant on a FULLY retained chain: 0 = everything
    assert(SnapshotStore.seqAtTimeOrBefore(root, t1 - 60000) === 0L)
    // expire the first two commits; t1 now falls in the EXPIRED range
    SnapshotStore.expire(root, keepLast = 1)
    val e = intercept[IllegalStateException](
      SnapshotStore.seqAtTimeOrBefore(root, t1))
    assert(e.getMessage.contains("expired past the retention horizon"))
    // the retained bound still resolves
    assert(SnapshotStore.seqAtTimeOrBefore(root,
      System.currentTimeMillis() + 60000) === 3L)
    // and the CDF face surfaces the same refusal
    val e2 = intercept[Exception](spark.read.format("graft-snapshot")
      .option("readChangeFeed", "true")
      .option("startingTimestamp", t2.toString)
      .load(root).count())
    assert(e2.getMessage.contains("expired past the retention horizon"))
  }

  test("the streaming tail honors startingTimestamp: an AvailableNow " +
      "drain from t1 emits exactly the post-t1 commits") {
    val root = mkRoot("streamts") + "/t"
    val Seq((_, t1), _, _) = threeCommits(root)
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_tstravel_ckpt").toString
    val q = spark.readStream.format("graft-snapshot")
      .option("startingTimestamp", t1.toString)
      .load(root)
      .writeStream.format("memory").queryName("ts_tail")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val ids = spark.table("ts_tail").select(col("id"))
      .as[Long].collect().toSet
    assert(ids === Set(2L, 3L),
      "the tail from t1 must skip commit 1's rows and emit 2 and 3")
  }
}
