package graft.streaming

import graft.{SparkSpec, Tables}
import graft.etl.{CsvExport, TaxiGen}
import org.apache.spark.sql.functions._

/** Incremental staged-drop ingest: each drain processes exactly the
  * newly staged shards, and the final table equals the batch chain. */
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

  test("two staged drops ingest incrementally and match the batch chain") {
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
    assert(spark.read.parquet(s"$root/table").count() === n1,
      "first drain must ingest exactly drop1")

    stageFiles("drop2")
    drain()
    val table = spark.read.parquet(s"$root/table")
    assert(table.count() === n, "second drain must add exactly drop2")

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
    val before = spark.read.parquet(s"$root/table").count()
    drain()
    assert(spark.read.parquet(s"$root/table").count() === before)
  }

  test("compaction restores the sorted one-file-per-month layout") {
    graft.etl.MergeTreeWriter.compact(spark, s"$root/table",
      s"$root/compacted")
    val src = spark.read.parquet(s"$root/table")
    val dst = spark.read.parquet(s"$root/compacted")
    assert(dst.count() === src.count())
    val months = new java.io.File(s"$root/compacted").listFiles()
      .filter(_.getName.startsWith("pickup_month="))
    assert(months.nonEmpty)
    months.foreach { m =>
      val files = m.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length === 1, s"${m.getName}: expected one file")
      // rows inside the file are time-sorted (data skipping works)
      val ts = spark.read.parquet(files.head.getPath)
        .select("pickup_datetime").collect().map(_.getTimestamp(0))
      assert(ts.zip(ts.tail).forall { case (a, b) => !a.after(b) },
        s"${m.getName} not sorted")
    }
  }
}
