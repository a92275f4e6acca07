package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the sliding-window and rolling-z-score lanes on crafted
  * fixtures where the expected assignments/flags are hand-computable,
  * plus stream ≡ batch on real testdata for the sliding twin. */
class SlidingAnomalySpec extends SparkSpec {
  import spark.implicits._

  test("sliding window assigns each event to exactly size/slide windows") {
    val df = EventQueries.slidingWindowStats(spark, sf())
    val ev = graft.Tables.events(spark, sf())
    val totalAssigned = df.agg(sum("cnt")).as[Long].head()
    val nEvents = ev.count()
    assert(totalAssigned == 6 * nEvents,
      s"expected 6x fan-out: $totalAssigned vs ${6 * nEvents}")
    // every window start is hour-aligned and covers its members:
    // re-join events to claimed windows and check the count per window
    val recheck = ev
      .select(col("event_type"), col("ts"))
      .join(df, Seq("event_type"))
      .filter(col("ts") >= col("win_start") &&
        col("ts") < col("win_start") + expr("INTERVAL 6 HOURS"))
      .groupBy("win_start", "event_type")
      .agg(count(lit(1)).as("n"))
      .join(df, Seq("win_start", "event_type"))
      .filter(col("n") =!= col("cnt"))
    assert(recheck.isEmpty, "window membership recount disagreed")
  }

  test("streaming sliding twin equals the batch lane exactly") {
    val batch = EventQueries.slidingWindowStats(spark, sf())
    val stream = EventQueries.streamSlidingStats(spark, sf())
    assert(stream.exceptAll(batch).isEmpty && batch.exceptAll(stream).isEmpty,
      "drained sliding stream != batch sliding aggregation")
  }

  test("rolling z-score flags a planted spike and only the spike") {
    // 30 hourly buckets of 5 events each, then hour 30 carries 50 —
    // baseline mean 5, sd 0 is degenerate, so jitter one baseline hour
    // to 6: sd stays tiny, the spike's z is huge, the jitter's is not.
    val rows = (0 until 31).flatMap { h =>
      val n = if (h == 30) 50 else if (h == 7) 6 else 5
      (0 until n).map(i =>
        (h.toLong * 100 + i, // event_id
          java.sql.Timestamp.from(java.time.Instant.parse("2024-01-01T00:30:00Z")
            .plusSeconds(h.toLong * 3600)),
          1L, "view", 1.0, "{}"))
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_anom").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/_stage")
    val part = java.nio.file.Files.list(java.nio.file.Paths.get(s"$dir/_stage"))
      .toArray.map(_.asInstanceOf[java.nio.file.Path])
      .find(_.getFileName.toString.endsWith(".parquet")).get
    java.nio.file.Files.move(part,
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val out = EventQueries.anomalyZscore(spark, dir)
      .select(col("hour_start"), col("cnt"), col("n_prior"),
        col("is_spike")).collect()
    // first 12 hours have n_prior < 12 and are filtered
    assert(out.length == 31 - 12, s"expected 19 scored hours, got ${out.length}")
    val spikes = out.filter(_.getBoolean(3))
    assert(spikes.length == 1 && spikes.head.getLong(1) == 50,
      s"expected exactly the planted 50-count spike, got ${spikes.mkString(";")}")
    // the trailing-24h-excluding-current frame: hour 30's baseline is
    // hours 6..29 (24 of them) — n_prior must say so
    val spikeRow = spikes.head
    assert(spikeRow.getLong(2) == 24, s"frame size ${spikeRow.getLong(2)}")
  }
}
