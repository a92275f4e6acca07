package graft.streaming

import graft.{SparkSpec, Tables}
import graft.etl.{CsvExport, SnapshotStore, TaxiGen}
import org.apache.spark.sql.functions._

/** The 24/7 tail-ingest mode: [[TaxiIngestStream.ingestContinuous]]
  * keeps the query up under a processing-time trigger, discovering
  * shards staged WHILE it runs — each discovered batch lands as its
  * own atomic snapshot append, and readers only ever resolve committed
  * batch prefixes. */
class ContinuousIngestSpec extends SparkSpec {

  // processScratchRoot: pid-suffixed (cross-JVM safe) AND swept for
  // dead pids, so repeated runs don't accumulate taxi-table copies
  private val root = {
    val r = graft.util.Fs.processScratchRoot("contingest", "")
    graft.util.Fs.deleteRecursively(new java.io.File(r))
    r
  }
  private def tableRoot = s"$root/table"

  private def stage(drop: String): Unit = {
    val dst = new java.io.File(s"$root/staging")
    dst.mkdirs()
    new java.io.File(s"$root/$drop").listFiles()
      .filter(_.getName.endsWith(".csv.gz"))
      .foreach { f =>
        java.nio.file.Files.copy(f.toPath,
          new java.io.File(dst, f.getName).toPath)
      }
  }

  private def eventually[A](timeoutMs: Long = 90000)(probe: => Option[A]): A = {
    val deadline = System.currentTimeMillis() + timeoutMs
    var r: Option[A] = None
    while (r.isEmpty && System.currentTimeMillis() < deadline) {
      r = probe
      if (r.isEmpty) Thread.sleep(100)
    }
    r.getOrElse(fail(s"condition not reached within ${timeoutMs}ms"))
  }

  private def tableCount: Option[Long] =
    SnapshotStore.current(tableRoot)
      .map(_ => SnapshotStore.read(spark, tableRoot).count())

  test("shards staged while the query runs are discovered by the " +
      "processing-time trigger and land as per-batch snapshot commits") {
    val raw = TaxiGen.fromLineitem(Tables.lineitem(spark, sf()))
    val n1 = raw.filter(pmod(col("trip_id"), lit(2L)) === 0).count()
    val n = raw.count()
    CsvExport.write(raw.filter(pmod(col("trip_id"), lit(2L)) === 0),
      s"$root/drop1", shards = 2)
    CsvExport.write(raw.filter(pmod(col("trip_id"), lit(2L)) =!= 0),
      s"$root/drop2", shards = 2)

    stage("drop1")
    val q = TaxiIngestStream.ingestContinuous(spark, s"$root/staging",
      tableRoot, s"$root/ckpt", intervalMs = 250)
    try {
      eventually() { tableCount.filter(_ == n1).map(_ => ()) }
      val idAfterFirst = SnapshotStore.current(tableRoot).get.id

      // the query is LIVE — feed it the second drop mid-run
      stage("drop2")
      eventually() { tableCount.filter(_ == n).map(_ => ()) }
      val after = SnapshotStore.current(tableRoot).get
      assert(after.id > idAfterFirst,
        "the tail batch must commit its own snapshot")
      // the second batch APPENDED parts (nothing restated/dropped)
      assert(after.entries.groupBy(_.value).exists(_._2.size >= 2),
        s"expected multi-part months after two tail appends: ${after.entries}")
      // per-writer replay token present under the canonical writer id
      val writerId = new java.io.File(s"$root/ckpt").getCanonicalPath
      assert(after.props.contains(SnapshotStore.AppendTokenPrefix + writerId))
    } finally q.stop()

    // a reader never saw anything but committed prefixes — final state
    // is exact (no dup, no loss) even though batches raced the poll
    assert(SnapshotStore.read(spark, tableRoot).count() === n)
    // restart from the same checkpoint with nothing new staged: no-op
    TaxiIngestStream.ingestAvailable(spark, s"$root/staging",
      tableRoot, s"$root/ckpt").awaitTermination()
    assert(SnapshotStore.read(spark, tableRoot).count() === n)
  }
}
