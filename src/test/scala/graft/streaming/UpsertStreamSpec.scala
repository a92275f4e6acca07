package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** foreachBatch keyed-upsert materialization: equals the batch argmax
  * and genuinely processes one micro-batch per staged chunk. */
class UpsertStreamSpec extends SparkSpec {

  test("final snapshot equals the batch per-key argmax; 4 micro-batches ran") {
    val work = java.nio.file.Files
      .createTempDirectory("graft_upsert_spec").toString
    val got = EventsStream.streamingUpsertLatest(spark, sf(),
      nChunks = 4, workDir = Some(work))
    val batch = {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      Tables.events(spark, sf())
        .withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
        .select(col("user_id"), col("event_id").as("last_event_id"),
          col("event_type").as("last_type"),
          round(col("value"), 4).as("last_value"))
    }
    assert(got.exceptAll(batch).isEmpty && batch.exceptAll(got).isEmpty)
    // one atomic snapshot commit per delivered micro-batch (ids are
    // allocated 1..n), with expire(keepLast=2) bounding on-disk state
    val root = s"$work/state_snap"
    assert(graft.etl.SnapshotStore.current(root).map(_.id) === Some(4L))
    val snapDirs = new java.io.File(s"$root/data").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("snap-"))
    assert(snapDirs.length <= 2)
    // every user appears exactly once in the final snapshot
    assert(got.groupBy("user_id").count()
      .filter(col("count") > 1).count() === 0L)
  }
}
