package graft.streaming

import graft.SparkSpec
import graft.etl.SnapshotStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** The CDC upsert sink on the snapshot layer
  * ([[EventsStream.upsertCommitBatch]]): durable cross-incarnation
  * recovery (the pre-snapshot scheme's `current` pointer was an
  * in-memory var, so a restarted JVM lost the state location),
  * re-delivery idempotence, torn-commit invisibility, and `expire`
  * retention.
  */
class StreamingUpsertSnapshotSpec extends SparkSpec {

  import spark.implicits._

  private def mkBatch(rows: (Long, String, Long, String, Double)*)
      : DataFrame =
    rows.map { case (id, ts, u, t, v) =>
      (id, java.sql.Timestamp.valueOf(ts), u, t, v)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")

  private def state(root: String): Set[(Long, Long, Double)] =
    EventsStream.upsertState(spark, root)
      .select("user_id", "last_event_id", "last_value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  private def tmpRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_upsnap_$tag").toString

  test("per-batch commits fold to the global argmax; a RE-DELIVERED " +
      "batch (crash after commit, before the checkpoint advanced) is " +
      "idempotent — same content, no duplicates") {
    val root = tmpRoot("redeliver")
    val b1 = mkBatch((1L, "2024-01-01 10:00:00", 7L, "view", 1.0),
      (2L, "2024-01-01 11:00:00", 8L, "view", 2.0))
    val b2 = mkBatch((3L, "2024-01-01 12:00:00", 7L, "click", 3.0))
    EventsStream.upsertCommitBatch(spark, root, b1)
    EventsStream.upsertCommitBatch(spark, root, b2)
    val after = state(root)
    assert(after === Set((7L, 3L, 3.0), (8L, 2L, 2.0)))
    // the crash-retry path: batch 2 delivered again
    EventsStream.upsertCommitBatch(spark, root, b2)
    assert(state(root) === after)
    assert(EventsStream.upsertState(spark, root).count() === 2)
  }

  test("a torn commit is invisible: a crash that wrote a state dir but " +
      "never swapped the pointer leaves readers on the previous " +
      "committed state, and the next commit + expire sweep the orphan") {
    val root = tmpRoot("torn")
    EventsStream.upsertCommitBatch(spark, root,
      mkBatch((1L, "2024-01-01 10:00:00", 7L, "view", 1.0)))
    val before = state(root)
    // simulate the crash window inside a commit: data written in full,
    // pointer never moved (commitDir's swap is the last step)
    val orphan = new java.io.File(s"$root/data/snap-99")
    mkBatch((999L, "2024-01-02 10:00:00", 7L, "view", 99.0))
      .write.parquet(orphan.toString)
    assert(state(root) === before, "orphan dir leaked into reads")
    EventsStream.upsertCommitBatch(spark, root,
      mkBatch((2L, "2024-01-01 11:00:00", 8L, "view", 2.0)))
    assert(state(root) === Set((7L, 1L, 1.0), (8L, 2L, 2.0)))
    assert(!orphan.exists(), "expire did not sweep the orphaned state dir")
  }

  test("kill between batches: two query incarnations over ONE " +
      "checkpoint and ONE snapshot root merge to the batch argmax — " +
      "recovery needs only what is on disk") {
    val work = java.nio.file.Files
      .createTempDirectory("graft_upsnap_restart").toString
    val root = s"$work/state_snap"
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType)))
    def land(c: Int, rows: DataFrame): Unit =
      rows.coalesce(1).write.parquet(s"$work/src/chunk_$c")
    def runIncarnation(): Unit = {
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "*.parquet")
        .parquet(s"$work/src/chunk_*")
        .writeStream
        .foreachBatch { (b: DataFrame, _: Long) =>
          EventsStream.upsertCommitBatch(spark, root, b); ()
        }
        .option("checkpointLocation", s"$work/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      try q.awaitTermination() finally q.stop()
    }
    // phase A: two chunks, then a hard stop (incarnation ends)
    land(0, mkBatch((1L, "2024-01-01 10:00:00", 7L, "view", 1.0),
      (2L, "2024-01-01 11:00:00", 8L, "view", 2.0)))
    land(1, mkBatch((3L, "2024-01-01 12:00:00", 7L, "click", 3.0)))
    runIncarnation()
    assert(state(root) === Set((7L, 3L, 3.0), (8L, 2L, 2.0)))
    // phase B: more data lands, a FRESH incarnation resumes from the
    // checkpoint + the durable manifest pointer — phase-A chunks must
    // not re-ingest, phase-A state must carry
    land(2, mkBatch((4L, "2024-01-01 09:00:00", 7L, "view", 0.5), // older: loses
      (5L, "2024-01-01 13:00:00", 9L, "buy", 5.0)))
    runIncarnation()
    assert(state(root) ===
      Set((7L, 3L, 3.0), (8L, 2L, 2.0), (9L, 5L, 5.0)))
    // retention bounded: expire(keepLast=2) held throughout
    val snaps = Option(new java.io.File(s"$root/data").listFiles())
      .getOrElse(Array.empty).count(_.getName.startsWith("snap-"))
    assert(snaps <= 2, s"retention leak: $snaps state dirs on disk")
  }
}
