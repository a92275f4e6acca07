package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the windowed-funnel fold and the greedy sequence counter on
  * planted event sequences, plus an independent replay equality on the
  * driver fixture. */
class FunnelSequenceSpec extends SparkSpec {

  private val HOUR = 3600L * 1000000L

  private def eventsDf(rows: Seq[(Long, Long, Long, String)]) = {
    import spark.implicits._
    rows.toDF("event_id", "us", "user_id", "event_type")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
        col("user_id"), col("event_type"),
        lit(0.0).as("value"), lit("{}").as("props"))
  }

  private def levels(rows: Seq[(Long, Long, Long, String)])
      : Map[Long, Int] = {
    val dir = java.nio.file.Files
      .createTempDirectory("funnel").toString
    eventsDf(rows).write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    EventQueries.funnelConversion(spark, dir).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Int]("funnel_level"))
      .toMap
  }

  test("funnel levels: complete chain, window cut, order violations") {
    val rows = Seq(
      // user 1: clean view→click→purchase inside 24 h → level 3
      (1L, 0L, 1L, "view"), (2L, 1 * HOUR, 1L, "click"),
      (3L, 2 * HOUR, 1L, "purchase"),
      // user 2: click lands 25 h after first view → stuck at level 1,
      // even though a LATER view would have qualified (earliest-chain
      // semantics anchor on the first view)
      (10L, 0L, 2L, "view"), (11L, 20 * HOUR, 2L, "view"),
      (12L, 25 * HOUR, 2L, "click"), (13L, 26 * HOUR, 2L, "purchase"),
      // user 3: purchase BEFORE click → level 2 (order matters)
      (20L, 0L, 3L, "view"), (21L, 1 * HOUR, 3L, "purchase"),
      (22L, 2 * HOUR, 3L, "click"),
      // user 4: purchase inside window of l1 but l2's strict > holds:
      // click at same µs as view does not count
      (30L, 5L, 4L, "view"), (31L, 5L, 4L, "click"),
      (32L, 6L, 4L, "purchase"),
      // user 5: no view at all → level 0
      (40L, 0L, 5L, "click"), (41L, 1L, 5L, "purchase"))
    assert(levels(rows) ===
      Map(1L -> 3, 2L -> 1, 3L -> 2, 4L -> 1, 5L -> 0))
  }

  test("funnel: chain completing exactly at the 24 h boundary counts") {
    val rows = Seq(
      (1L, 0L, 1L, "view"), (2L, 23 * HOUR, 1L, "click"),
      (3L, 24 * HOUR, 1L, "purchase"), // ts == l1 + 24 h → inclusive
      (10L, 0L, 2L, "view"), (11L, 23 * HOUR, 2L, "click"),
      (12L, 24 * HOUR + 1L, 2L, "purchase")) // one µs past → out
    assert(levels(rows) === Map(1L -> 3, 2L -> 2))
  }

  test("sequence_count: greedy non-overlapping matches run boundaries") {
    val dir = java.nio.file.Files
      .createTempDirectory("seqcnt").toString
    // user 1: P V V P P V P → 2 (greedy: VV→first P, then V→P)
    // user 2: V P V P → 2; user 3: only views → 0; user 4: clicks → 0
    val rows = Seq(
      (1L, 0L, 1L, "purchase"), (2L, 1L, 1L, "view"),
      (3L, 2L, 1L, "view"), (4L, 3L, 1L, "purchase"),
      (5L, 4L, 1L, "purchase"), (6L, 5L, 1L, "view"),
      (7L, 6L, 1L, "purchase"),
      (10L, 0L, 2L, "view"), (11L, 1L, 2L, "purchase"),
      (12L, 2L, 2L, "view"), (13L, 3L, 2L, "purchase"),
      (20L, 0L, 3L, "view"), (21L, 1L, 3L, "view"),
      (30L, 0L, 4L, "click"))
    eventsDf(rows).write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    val got = EventQueries.sequenceCount(spark, dir).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("n_sequences"))
      .toMap
    assert(got === Map(1L -> 2L, 2L -> 2L, 3L -> 0L, 4L -> 0L))
  }

  test("streaming funnel: drained stream ≡ batch fold, cut-invariant") {
    val batch = EventQueries.funnelConversion(spark, sf()).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Int]("funnel_level"))
      .toMap
    val s4 = graft.streaming.StatefulFunnel
      .funnelLevels(spark, sf(), nChunks = 4, queryName = "tws_f4")
      .collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Int]("funnel_level"))
      .toMap
    val s1 = graft.streaming.StatefulFunnel
      .funnelLevels(spark, sf(), nChunks = 1, queryName = "tws_f1")
      .collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Int]("funnel_level"))
      .toMap
    assert(s4 === batch, "4-chunk drain equals batch")
    assert(s1 === batch, "single-batch drain equals batch")
  }

  test("out-of-order streaming funnel: hash-chunked arrival ≡ batch") {
    val batch = EventQueries.funnelConversion(spark, sf()).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Int]("funnel_level"))
      .toMap
    val ooo = graft.streaming.StatefulFunnel
      .funnelLevelsOutOfOrder(spark, sf(), nChunks = 5,
        queryName = "tws_ooo5").collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Int]("funnel_level"))
      .toMap
    assert(ooo === batch)
  }

  test("out-of-order funnel: chain steps arriving in REVERSE batch " +
    "order still complete") {
    // event_ids chosen so hash chunking (id % 4) delivers purchase in
    // batch 0, click in batch 1, view in batch 2 — the arrival order
    // the chronological processor cannot handle
    val rows = Seq(
      (0L, 2 * HOUR, 1L, "purchase"),
      (1L, 1 * HOUR, 1L, "click"),
      (2L, 0L, 1L, "view"))
    val dir = java.nio.file.Files
      .createTempDirectory("funnel_rev").toString
    eventsDf(rows).write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    val got = graft.streaming.StatefulFunnel
      .funnelLevelsOutOfOrder(spark, dir, nChunks = 4,
        queryName = "tws_ooo_rev").collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Int]("funnel_level"))
      .toMap
    assert(got === Map(1L -> 3))
  }

  test("fixture replay: fold ≡ staged min-chaining on sf0.001") {
    // independent implementation of the same greedy semantics: the
    // three-stage conditional-min chain (one agg+join per stage)
    val ev = graft.Tables.events(spark, sf())
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("t"))
    val win = 24 * HOUR
    val l1 = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("t").as("t1"))
    val l2 = ev.filter(col("event_type") === "click").join(l1, "user_id")
      .filter(col("t") > col("t1") && col("t") <= col("t1") + win)
      .groupBy("user_id").agg(min("t").as("t2"), min("t1").as("t1b"))
    val l3 = ev.filter(col("event_type") === "purchase")
      .join(l2, "user_id")
      .filter(col("t") > col("t2") && col("t") <= col("t1b") + win)
      .groupBy("user_id").agg(min("t").as("t3"))
    val staged = ev.select("user_id").distinct()
      .join(l1.select("user_id"), Seq("user_id"), "left_semi")
      .withColumn("has1", lit(1))
      .unionByName(
        ev.select("user_id").distinct()
          .join(l1.select("user_id"), Seq("user_id"), "left_anti")
          .withColumn("has1", lit(0)))
    val lv = staged
      .join(l2.select(col("user_id"), lit(1).as("has2")),
        Seq("user_id"), "left")
      .join(l3.select(col("user_id"), lit(1).as("has3")),
        Seq("user_id"), "left")
      .select(col("user_id"),
        (coalesce(col("has3"), lit(0)) + coalesce(col("has2"), lit(0))
          + col("has1")).as("funnel_level"))
      .collect().map(r => r.getLong(0) -> r.getAs[Int]("funnel_level"))
      .toMap
    val fold = EventQueries.funnelConversion(spark, sf()).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Int]("funnel_level"))
      .toMap
    assert(fold === lv)
    assert(fold.values.toSet.size > 1, "fixture exercises several levels")
  }
}
