package graft.streaming

import java.util.concurrent.atomic.{AtomicBoolean, AtomicReference}

import graft.{SparkSpec, Tables}
import graft.etl.{CsvExport, SnapshotStore, TaxiGen}
import org.apache.spark.sql.functions._

/** Compaction concurrent with live streaming ingest and a live reader
  * — the interleaving round 8 left untested: `compact` and the
  * streaming append both take the table lock, so batches must never be
  * lost to a compaction of the snapshot that preceded them, readers
  * must always resolve a whole committed manifest, and the per-writer
  * replay token must survive every compact (props are durable table
  * metadata). */
class CompactIngestRaceSpec extends SparkSpec {

  // processScratchRoot: pid-suffixed (cross-JVM safe) AND swept for
  // dead pids, so repeated runs don't accumulate taxi-table copies
  private val root = {
    val r = graft.util.Fs.processScratchRoot("compactrace", "")
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

  private def drain(): Unit =
    TaxiIngestStream.ingestAvailable(spark, s"$root/staging",
      tableRoot, s"$root/ckpt").awaitTermination()

  test("compact races live ingest batches and a live reader: no lost " +
      "batch, no torn read, replay token intact across compacts") {
    val raw = TaxiGen.fromLineitem(Tables.lineitem(spark, sf()))
    val counts = (0 until 3)
      .map(i => raw.filter(pmod(col("trip_id"), lit(3L)) === i).count())
    val total = counts.sum
    assert(counts.forall(_ > 0))
    (0 until 3).foreach(i => CsvExport.write(
      raw.filter(pmod(col("trip_id"), lit(3L)) === i.toLong),
      s"$root/drop$i", shards = 2))
    // every count a reader may legally observe: a committed batch
    // prefix (compaction rewrites layout, never content)
    val validCounts = counts.scanLeft(0L)(_ + _).tail.toSet

    val stop = new AtomicBoolean(false)
    val bad = new AtomicReference[String](null)
    val reader = new Thread(() => {
      while (!stop.get()) {
        if (SnapshotStore.current(tableRoot).isDefined) {
          try {
            val c = SnapshotStore.read(spark, tableRoot).count()
            if (!validCounts.contains(c))
              bad.compareAndSet(null,
                s"reader saw $c — not a committed batch prefix $validCounts")
          } catch {
            case e: Throwable =>
              bad.compareAndSet(null, s"reader threw: ${e.getMessage}")
          }
        }
        Thread.sleep(10)
      }
    })
    var compactions = 0
    val compactor = new Thread(() => {
      while (!stop.get()) {
        if (SnapshotStore.current(tableRoot).isDefined) {
          try {
            SnapshotStore.compact(spark, tableRoot,
              partCol = "pickup_month", sortCol = "pickup_datetime")
            compactions += 1
          } catch {
            case e: Throwable =>
              bad.compareAndSet(null, s"compact threw: ${e.getMessage}")
          }
        }
        Thread.sleep(30)
      }
    })
    reader.start(); compactor.start()
    try (0 until 3).foreach { i => stage(s"drop$i"); drain() }
    finally { stop.set(true); reader.join(60000); compactor.join(60000) }

    assert(bad.get() === null, s"race violation: ${bad.get()}")
    assert(compactions > 0, "the race never actually compacted")
    // nothing lost, nothing doubled
    assert(SnapshotStore.read(spark, tableRoot).count() === total)
    // the replay token survived every interleaved compact commit
    val m = SnapshotStore.current(tableRoot).get
    val writerId = new java.io.File(s"$root/ckpt").getCanonicalPath
    assert(m.props.contains(SnapshotStore.AppendTokenPrefix + writerId),
      s"replay token lost across compaction: ${m.props.keySet}")
    // and the pipeline stays idempotent: an empty re-drain is a no-op
    drain()
    assert(SnapshotStore.read(spark, tableRoot).count() === total)
  }
}
