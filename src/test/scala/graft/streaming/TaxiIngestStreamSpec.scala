package graft.streaming

import graft.{SparkSpec, Tables}
import graft.etl.{CsvExport, SnapshotStore, TaxiGen}
import org.apache.spark.sql.functions._

/** Incremental staged-drop ingest through the snapshot layer: each
  * drain processes exactly the newly staged shards, every micro-batch
  * lands as an atomic append commit (a part per month per batch), and
  * the final table equals the batch chain. */
class TaxiIngestStreamSpec extends SparkSpec {

  private val root =
    s"${sys.props("java.io.tmpdir")}/graft_taxistream_spec_${System.nanoTime}"

  private def stageFiles(drop: String): Unit = {
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
      s"$root/table", s"$root/ckpt").awaitTermination()

  private def table = SnapshotStore.read(spark, s"$root/table")

  test("two staged drops ingest incrementally as append commits and " +
      "match the batch chain") {
    val raw = TaxiGen.fromLineitem(Tables.lineitem(spark, sf()))
    val n = raw.count()
    val n1 = raw.filter(pmod(col("trip_id"), lit(2L)) === 0).count()
    assert(n1 > 0 && n1 < n)
    CsvExport.write(raw.filter(pmod(col("trip_id"), lit(2L)) === 0),
      s"$root/drop1", shards = 2)
    CsvExport.write(raw.filter(pmod(col("trip_id"), lit(2L)) =!= 0),
      s"$root/drop2", shards = 2)

    stageFiles("drop1")
    drain()
    assert(table.count() === n1, "first drain must ingest exactly drop1")

    stageFiles("drop2")
    drain()
    assert(table.count() === n, "second drain must add exactly drop2")

    // the second drain APPENDED parts — months now hold one dir per
    // batch (the MergeTree insert shape), nothing was dropped
    val m = SnapshotStore.current(s"$root/table").get
    val partsPerMonth = m.entries.groupBy(_.value).map(_._2.size)
    assert(partsPerMonth.exists(_ >= 2),
      s"expected multi-part months after two appends: ${m.entries}")
    // the batch-id idempotence token is durable table metadata,
    // slotted per writer (keyed by this pipeline's checkpoint dir)
    assert(m.props.contains(
      SnapshotStore.AppendTokenPrefix + s"$root/ckpt"))

    // the appended table agrees with the batch chain per cab_type
    val got = table.groupBy("cab_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = graft.etl.MergeTreeWriter
      .read(spark, graft.queries.TaxiPipelineQueries.prepare(spark, sf()))
      .groupBy("cab_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === want)
  }

  test("re-draining with nothing new staged is a no-op") {
    val before = table.count()
    drain()
    assert(table.count() === before)
  }

  test("a re-delivered batch token is skipped: replaying the LAST " +
      "append (the only batch a crashed checkpoint can re-deliver) " +
      "adds no rows and no commit") {
    val m = SnapshotStore.current(s"$root/table").get
    val lastToken = m.props(SnapshotStore.AppendTokenPrefix + s"$root/ckpt")
    val before = table.count()
    val id = SnapshotStore.appendPartitions(
      table.limit(50), s"$root/table",
      partCol = "pickup_month", sortCol = "pickup_datetime",
      idempotence = Some((s"$root/ckpt", lastToken)))
    assert(id === m.id, "retry must not advance the snapshot")
    assert(table.count() === before, "retry must not duplicate rows")
  }

  test("a SECOND writer's commit does not erase the first writer's " +
      "replay protection: with per-writer token slots, writer A's " +
      "retried last batch is still skipped after writer B appends") {
    val mA = SnapshotStore.current(s"$root/table").get
    val tokenA = mA.props(SnapshotStore.AppendTokenPrefix + s"$root/ckpt")
    // writer B (a different checkpoint) appends — its batch ids start
    // at 0 again; under a single shared slot this commit would have
    // overwritten A's recorded token
    SnapshotStore.appendPartitions(
      table.limit(20), s"$root/table",
      partCol = "pickup_month", sortCol = "pickup_datetime",
      idempotence = Some((s"$root/ckptB", "0")))
    val afterB = table.count()
    // writer A crashes post-commit pre-checkpoint and re-delivers its
    // LAST batch: must still be recognized as a replay
    val id = SnapshotStore.appendPartitions(
      table.limit(50), s"$root/table",
      partCol = "pickup_month", sortCol = "pickup_datetime",
      idempotence = Some((s"$root/ckpt", tokenA)))
    val mNow = SnapshotStore.current(s"$root/table").get
    assert(id === mNow.id, "A's retry must not advance the snapshot")
    assert(table.count() === afterB, "A's retry must not duplicate rows")
    // and B's own replay slot is independently recorded
    assert(mNow.props(SnapshotStore.AppendTokenPrefix + s"$root/ckptB") === "0")
  }

  test("compaction folds the per-batch parts back to one sorted dir " +
      "per month — in place, as a snapshot commit") {
    SnapshotStore.compact(spark, s"$root/table",
      partCol = "pickup_month", sortCol = "pickup_datetime")
    val m = SnapshotStore.current(s"$root/table").get
    val counts = m.entries.groupBy(_.value).map(_._2.size).toSet
    assert(counts === Set(1), s"months still multi-part: ${m.entries}")
    m.entries.foreach { e =>
      val dir = new java.io.File(s"$root/table/${e.dir}")
      val files = dir.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length === 1, s"${e.value}: expected one file")
      // rows inside the file are time-sorted (data skipping works)
      val ts = spark.read.parquet(files.head.getPath)
        .select("pickup_datetime").collect().map(_.getTimestamp(0))
      assert(ts.zip(ts.tail).forall { case (a, b) => !a.after(b) },
        s"${e.value} not sorted")
    }
  }
}
