package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class LateDataGateSpec extends SparkSpec {

  test("quarantine counts equal the batch replay of the per-key " +
      "pre-batch high-water-mark rule, and both classes are non-empty") {
    val nChunks = 4
    val delayMs = 3600000L
    val got = LateDataGate.quarantineCounts(spark, sf(), nChunks, delayMs)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap

    // Scala-side replay: chunk = event_id % nChunks processed in
    // order; threshold = (max ts_ms of earlier chunks, same key) - delay
    val rows = Tables.events(spark, sf())
      .select(col("event_id"), col("event_type"),
        unix_millis(col("ts")).as("ts_ms"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byKey = rows.groupBy(_._2)
    val want = byKey.map { case (k, evs) =>
      val chunks = evs.groupBy(e => e._1 % nChunks)
      var late = 0L
      var ontime = 0L
      (0 until nChunks).foreach { c =>
        val prev = (0 until c)
          .flatMap(i => chunks.getOrElse(i.toLong,
            Array.empty[(Long, String, Long)]).toSeq)
          .map(_._3)
        val thr = if (prev.isEmpty) Long.MinValue else prev.max - delayMs
        chunks.getOrElse(c.toLong, Array.empty[(Long, String, Long)])
          .foreach(e => if (e._3 < thr) late += 1 else ontime += 1)
      }
      k -> (ontime, late)
    }
    assert(got === want)
    // the gate genuinely partitions: both classes occur
    assert(got.values.map(_._2).sum > 0, "no late rows — gate untested")
    assert(got.values.map(_._1).sum > 0)
    // nothing is lost: admit + quarantine = input
    assert(got.values.map(v => v._1 + v._2).sum === rows.length.toLong)
    // provider override did not leak
    assert(!spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
      .exists(_.contains("RocksDB")))
  }
}
