package graft.streaming

import graft.SparkSpec
import graft.etl.SnapshotStore
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming tail of a snapshot table's commit chain:
  * `readStream.format("graft-snapshot")` — each commit = one batch of
  * newly-listed dirs, offsets = chain sequences in the checkpoint. */
class SnapshotTailStreamSpec extends SparkSpec {

  import spark.implicits._

  private def rows(tag: Double, months: String*) =
    months.zipWithIndex.map { case (m, i) =>
      (i.toLong + (tag * 100).toLong, m,
        java.sql.Timestamp.valueOf(s"$m-05 00:00:00"), tag)
    }.toDF("id", "m", "ts", "price")

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_tail_$tag").toString

  /** Drain everything currently committed through a fresh AvailableNow
    * run over `checkpoint`, collecting (batchId → rows) into `sink`. */
  private def drain(root: String, checkpoint: String,
      sink: scala.collection.mutable.ArrayBuffer[(Long, Seq[Row])])
      : Unit = {
    val q = spark.readStream.format("graft-snapshot").load(root)
      .writeStream
      .foreachBatch { (df: DataFrame, id: Long) =>
        sink.synchronized { sink += ((id, df.collect().toSeq)) }
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  test("the tail emits the whole current table first, then ONLY what " +
      "each later commit added; restart resumes from the checkpoint") {
    val root = tmpDir("basic") + "/t"
    val ckpt = tmpDir("basic_ck")
    SnapshotStore.write(rows(1.0, "2024-01", "2024-02"), root, "m", "ts")
    val sink = scala.collection.mutable.ArrayBuffer[(Long, Seq[Row])]()
    drain(root, ckpt, sink)
    assert(sink.map(_._2.size).sum === 2, "initial batch = whole table")
    // two appends while no stream is running
    SnapshotStore.appendPartitions(rows(2.0, "2024-03"), root, "m", "ts")
    SnapshotStore.appendPartitions(rows(3.0, "2024-01"), root, "m", "ts")
    val before = sink.size
    drain(root, ckpt, sink)
    val newRows = sink.drop(before).flatMap(_._2)
    assert(newRows.size === 2, "restart emits ONLY the appended rows")
    assert(newRows.map(_.getDouble(3)).toSet === Set(2.0, 3.0))
    // nothing new → nothing emitted (an empty batch at most)
    val before2 = sink.size
    drain(root, ckpt, sink)
    assert(sink.drop(before2).flatMap(_._2).isEmpty)
    // total drained ≡ the batch read
    assert(sink.flatMap(_._2).size ===
      SnapshotStore.read(spark, root).count())
  }

  test("a copy-on-write restatement re-emits the restated partition " +
      "wholesale (ignoreChanges semantics); a partition DELETE emits " +
      "nothing") {
    val root = tmpDir("restate") + "/t"
    val ckpt = tmpDir("restate_ck")
    SnapshotStore.write(rows(1.0, "2024-01", "2024-02"), root, "m", "ts")
    val sink = scala.collection.mutable.ArrayBuffer[(Long, Seq[Row])]()
    drain(root, ckpt, sink)
    SnapshotStore.overwritePartitions(rows(9.0, "2024-02"), root, "m", "ts")
    val before = sink.size
    drain(root, ckpt, sink)
    val re = sink.drop(before).flatMap(_._2)
    assert(re.map(r => (r.getString(1), r.getDouble(3))) ===
      Seq(("2024-02", 9.0)),
      "exactly the restated partition's new content, nothing else")
    SnapshotStore.dropPartitions(root, Some(Set("2024-01")))
    val before2 = sink.size
    drain(root, ckpt, sink)
    assert(sink.drop(before2).flatMap(_._2).isEmpty,
      "a metadata-only DELETE emits nothing")
  }

  test("a consumer that fell behind gets ONE coalesced batch from the " +
      "endpoint manifests; falling past the retention horizon fails " +
      "LOUDLY") {
    val root = tmpDir("behind") + "/t"
    val ckpt = tmpDir("behind_ck")
    SnapshotStore.write(rows(1.0, "2024-01"), root, "m", "ts")
    val sink = scala.collection.mutable.ArrayBuffer[(Long, Seq[Row])]()
    drain(root, ckpt, sink) // checkpoint now at seq 1
    // three commits land while the consumer is away
    SnapshotStore.appendPartitions(rows(2.0, "2024-02"), root, "m", "ts")
    SnapshotStore.appendPartitions(rows(3.0, "2024-03"), root, "m", "ts")
    SnapshotStore.appendPartitions(rows(4.0, "2024-04"), root, "m", "ts")
    val before = sink.size
    drain(root, ckpt, sink)
    val caught = sink.drop(before)
    assert(caught.flatMap(_._2).size === 3, "all three commits arrive")
    assert(caught.count(_._2.nonEmpty) === 1,
      "coalesced into ONE catch-up batch (endpoint-diff, not per-commit)")
    // now expire the consumer's endpoint out from under it
    SnapshotStore.appendPartitions(rows(5.0, "2024-05"), root, "m", "ts")
    SnapshotStore.expire(root, keepLast = 1)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain(root, ckpt, sink)
    }
    assert(String.valueOf(e.getCause).contains("retention horizon"),
      s"expected the loud data-loss error, got: ${e.getCause}")
  }

  test("a time-travel (asOf) load cannot be tailed: the pin would be " +
      "silently ignored, so the capability is absent and the stream " +
      "is rejected at analysis") {
    val root = tmpDir("asof") + "/t"
    val id1 = SnapshotStore.write(rows(1.0, "2024-01"), root, "m", "ts")
    SnapshotStore.appendPartitions(rows(2.0, "2024-02"), root, "m", "ts")
    val e = intercept[Exception] {
      spark.readStream.format("graft-snapshot")
        .option("asOf", id1).load(root)
        .writeStream.format("noop")
        .trigger(Trigger.AvailableNow()).start()
    }
    assert(String.valueOf(e.getMessage).toLowerCase
      .contains("does not support streamed reading"),
      s"unexpected rejection shape: ${e.getMessage}")
  }

  test("batch changeFeed: append = inserts; restatement = delete(old " +
      "content) + insert(new); partition DELETE = deletes only") {
    val root = tmpDir("cdf") + "/t"
    SnapshotStore.write(rows(1.0, "2024-01", "2024-02"), root, "m", "ts")
    SnapshotStore.appendPartitions(rows(2.0, "2024-03"), root, "m", "ts")
    def feed(a: Long, b: Long) =
      SnapshotStore.changeFeed(spark, root, a, b).collect()
        .map(r => (r.getString(1), r.getDouble(3),
          r.getString(r.fieldIndex("_change_type")))).toSet
    assert(feed(1, 2) === Set(("2024-03", 2.0, "insert")))
    SnapshotStore.overwritePartitions(rows(9.0, "2024-02"), root, "m", "ts")
    assert(feed(2, 3) === Set(
      ("2024-02", 1.0, "delete"), ("2024-02", 9.0, "insert")))
    SnapshotStore.dropPartitions(root, Some(Set("2024-01")))
    assert(feed(3, 4) === Set(("2024-01", 1.0, "delete")))
    // from table start: PER-COMMIT replay (Delta table_changes
    // semantics) — every commit's changes appear, including the ones a
    // net endpoint diff would cancel away (the 2024-02 restatement's
    // delete+insert, the 2024-01 insert-then-delete)
    assert(feed(0, 4) === Set(
      ("2024-01", 1.0, "insert"), ("2024-02", 1.0, "insert"),
      ("2024-03", 2.0, "insert"),
      ("2024-02", 1.0, "delete"), ("2024-02", 9.0, "insert"),
      ("2024-01", 1.0, "delete")))
    val e = intercept[IllegalArgumentException](feed(3, 2))
    assert(e.getMessage.contains("inverted"))
  }

  test("streaming CHANGE FEED (readChangeFeed=true): per-commit batches " +
      "carry _change_type — append = inserts, restatement = delete(old) " +
      "+ insert(new), partition DELETE = deletes only; a coalesced " +
      "catch-up replays PER COMMIT (union, nothing dropped)") {
    val root = tmpDir("cdfstream") + "/t"
    SnapshotStore.write(rows(1.0, "2024-01", "2024-02"), root, "m", "ts")
    SnapshotStore.appendPartitions(rows(2.0, "2024-03"), root, "m", "ts")
    SnapshotStore.overwritePartitions(rows(9.0, "2024-02"), root, "m", "ts")
    SnapshotStore.dropPartitions(root, Some(Set("2024-01")))
    def drainCdf(ckpt: String, cap: Option[Int])
        : Seq[Set[(String, Double, String)]] = {
      val sink = scala.collection.mutable.ArrayBuffer[(Long, Seq[Row])]()
      var r = spark.readStream.format("graft-snapshot")
        .option("readChangeFeed", "true")
      cap.foreach(k => r = r.option("maxCommitsPerTrigger", k))
      val q = r.load(root).writeStream
        .foreachBatch { (df: DataFrame, id: Long) =>
          sink.synchronized { sink += ((id, df.collect().toSeq)) }
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      sink.sortBy(_._1).map(_._2.map(row => (row.getString(1),
        row.getDouble(3),
        row.getString(row.fieldIndex("_change_type")))).toSet).toSeq
        .filter(_.nonEmpty)
    }
    // per-commit: one batch per chain slot
    val perCommit = drainCdf(tmpDir("cdfstream_ck1"), cap = Some(1))
    assert(perCommit === Seq(
      Set(("2024-01", 1.0, "insert"), ("2024-02", 1.0, "insert")),
      Set(("2024-03", 2.0, "insert")),
      Set(("2024-02", 1.0, "delete"), ("2024-02", 9.0, "insert")),
      Set(("2024-01", 1.0, "delete"))))
    // coalesced catch-up: PER-COMMIT replay in one batch — the UNION
    // of the commits' changes, nothing dropped (Delta CDF semantics;
    // pre-r12 this emitted the lossy NET endpoint diff)
    val coalesced = drainCdf(tmpDir("cdfstream_ck2"), cap = None)
    assert(coalesced === Seq(perCommit.reduce(_ union _)))
    // refusals: asOf + CDF is contradictory; so is a shadowed tag column
    intercept[Exception] {
      spark.readStream.format("graft-snapshot")
        .option("readChangeFeed", "true").option("asOf", "1")
        .load(root).schema
    }
    val shadowRoot = tmpDir("cdfshadow") + "/t"
    SnapshotStore.write(
      Seq((1L, "2024-01", "x")).toDF("id", "m", "_CHANGE_TYPE"),
      shadowRoot, "m", "id")
    intercept[Exception] {
      spark.readStream.format("graft-snapshot")
        .option("readChangeFeed", "true").load(shadowRoot).schema
    }
  }

  test("the CDF stream survives a restart: a second incarnation over " +
      "the same checkpoint resumes at the committed offset and emits " +
      "ONLY later commits' changes, tags intact") {
    val root = tmpDir("cdfrestart") + "/t"
    val ckpt = tmpDir("cdfrestart_ck")
    SnapshotStore.write(rows(1.0, "2024-01", "2024-02"), root, "m", "ts")
    SnapshotStore.appendPartitions(rows(2.0, "2024-03"), root, "m", "ts")
    def drainOnce(): Set[(String, Double, String)] = {
      val sink = scala.collection.mutable.ArrayBuffer[Row]()
      val q = spark.readStream.format("graft-snapshot")
        .option("readChangeFeed", "true").load(root)
        .writeStream
        .foreachBatch { (df: DataFrame, _: Long) =>
          sink.synchronized { sink ++= df.collect() }
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      sink.map(r => (r.getString(1), r.getDouble(3),
        r.getString(r.fieldIndex("_change_type")))).toSet
    }
    // incarnation 1: everything so far, as inserts
    val first = drainOnce()
    assert(first === Set(
      ("2024-01", 1.0, "insert"), ("2024-02", 1.0, "insert"),
      ("2024-03", 2.0, "insert")))
    // between incarnations: a restatement (delete+insert) and a drop
    SnapshotStore.overwritePartitions(rows(9.0, "2024-02"), root, "m", "ts")
    SnapshotStore.dropPartitions(root, Some(Set("2024-01")))
    // incarnation 2 over the SAME checkpoint: only the new commits
    val second = drainOnce()
    assert(second === Set(
      ("2024-02", 1.0, "delete"), ("2024-02", 9.0, "insert"),
      ("2024-01", 1.0, "delete")),
      "the restart must resume at the committed offset, re-emit nothing")
  }

  test("a ROLLBACK reads through the change feed as delete(the bad " +
      "content) + insert(the restored content) — downstream consumers " +
      "converge on the restored state with no special casing") {
    val root = tmpDir("cdfrollback") + "/t"
    SnapshotStore.write(rows(1.0, "2024-01", "2024-02"), root, "m", "ts")
    // the "bad" commit: a restatement that corrupts 2024-02
    SnapshotStore.overwritePartitions(rows(666.0, "2024-02"),
      root, "m", "ts")
    assert(SnapshotStore.currentSeq(root) === 2L)
    SnapshotStore.rollback(root, 1L) // seq 3 = the restored state
    val feed = SnapshotStore.changeFeed(spark, root, 2L, 3L).collect()
      .map(r => (r.getString(1), r.getDouble(3),
        r.getString(r.fieldIndex("_change_type")))).toSet
    assert(feed === Set(
      ("2024-02", 666.0, "delete"), ("2024-02", 1.0, "insert")),
      "rollback = delete(bad) + insert(restored) through the feed")
    // the whole-history view replays per commit: the corruption AND
    // its rollback both appear, and retract-then-upsert application
    // still converges on the restored content
    val net = SnapshotStore.changeFeed(spark, root, 0L, 3L).collect()
      .map(r => (r.getString(1), r.getDouble(3),
        r.getString(r.fieldIndex("_change_type")))).toSet
    assert(net === Set(
      ("2024-01", 1.0, "insert"), ("2024-02", 1.0, "insert"),
      ("2024-02", 666.0, "insert"), ("2024-02", 666.0, "delete"),
      ("2024-02", 1.0, "delete")))
  }

  test("changeFeed refuses a pre-existing change-type column in ANY " +
      "case — Spark resolution is case-insensitive, so _CHANGE_TYPE " +
      "would be silently replaced too") {
    import spark.implicits._
    val root = tmpDir("cdfcase") + "/t"
    val df = Seq((1L, "2024-01", "x"), (2L, "2024-02", "y"))
      .toDF("id", "m", "_CHANGE_TYPE")
    SnapshotStore.write(df, root, "m", "id")
    SnapshotStore.appendPartitions(
      Seq((3L, "2024-03", "z")).toDF("id", "m", "_CHANGE_TYPE"),
      root, "m", "id")
    val e = intercept[IllegalArgumentException](
      SnapshotStore.changeFeed(spark, root, 1, 2))
    assert(e.getMessage.contains("_change_type"))
  }

  test("maxCommitsPerTrigger bounds admission: a catch-up over three " +
      "commits arrives as three single-commit batches") {
    val root = tmpDir("adm") + "/t"
    val ckpt = tmpDir("adm_ck")
    SnapshotStore.write(rows(1.0, "2024-01"), root, "m", "ts")
    SnapshotStore.appendPartitions(rows(2.0, "2024-02"), root, "m", "ts")
    SnapshotStore.appendPartitions(rows(3.0, "2024-03"), root, "m", "ts")
    val sink = scala.collection.mutable.ArrayBuffer[(Long, Seq[Row])]()
    val q = spark.readStream.format("graft-snapshot")
      .option("maxCommitsPerTrigger", 1).load(root)
      .writeStream
      .foreachBatch { (df: DataFrame, id: Long) =>
        sink.synchronized { sink += ((id, df.collect().toSeq)) }
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(sink.count(_._2.nonEmpty) === 3,
      s"one batch per commit, got ${sink.map(_._2.size)}")
    assert(sink.flatMap(_._2).size === 3)
    assert(sink.flatMap(_._2).map(_.getDouble(3)).toSet ===
      Set(1.0, 2.0, 3.0))
  }

  test("startingSeq skips history: a tail started at the current head " +
      "sees only future commits") {
    val root = tmpDir("head") + "/t"
    val ckpt = tmpDir("head_ck")
    SnapshotStore.write(rows(1.0, "2024-01", "2024-02"), root, "m", "ts")
    val head = SnapshotStore.currentSeq(root)
    SnapshotStore.appendPartitions(rows(2.0, "2024-03"), root, "m", "ts")
    val sink = scala.collection.mutable.ArrayBuffer[(Long, Seq[Row])]()
    val q = spark.readStream.format("graft-snapshot")
      .option("startingSeq", head).load(root)
      .writeStream
      .foreachBatch { (df: DataFrame, id: Long) =>
        sink.synchronized { sink += ((id, df.collect().toSeq)) }
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(sink.flatMap(_._2).map(_.getDouble(3)).toSet === Set(2.0),
      "only the post-head append arrives")
  }
}
