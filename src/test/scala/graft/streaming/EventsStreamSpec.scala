package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class EventsStreamSpec extends SparkSpec {

  test("streaming hourly agg equals the batch equivalent") {
    val streamed = EventsStream.hourlyStats(spark, sf(), "spec_hourly")
    val batch = Tables.events(spark, sf())
      .groupBy(date_trunc("hour", col("ts")).as("hour_start"),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        round(sum(col("value").cast("decimal(38,8)")).cast("double"), 4)
          .as("sum_value"))
    assert(streamed.count() === batch.count())
    assert(streamed.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streamed).count() === 0)
  }

  test("bounded-state streaming dedup (watermarked) equals batch DISTINCT") {
    val streamed = EventsStream.streamingDedupBoundedCounts(
      spark, sf(), "spec_dedup_wm")
    val batch = Tables.events(spark, sf())
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("distinct_users"))
    assert(streamed.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streamed).count() === 0)
  }

  test("session_window agrees with the hand-built lag/cumsum sessionizer") {
    // native session_window sessions per user == sessionize's n_sessions
    val sw = graft.queries.EventQueries.sessionWindowAgg(spark, sf())
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), sum("n_events").as("n_events"))
    val hand = graft.queries.EventQueries.sessionize(spark, sf())
      .select(col("user_id"), col("n_sessions"), col("n_events"))
    assert(sw.exceptAll(hand).count() === 0)
    assert(hand.exceptAll(sw).count() === 0)
  }

  test("streaming session windows emit exactly the watermark-closed set") {
    val streamed = EventsStream.streamingSessionWindows(
      spark, sf(), "spec_swin")
    val maxTs = Tables.events(spark, sf())
      .agg(max(col("ts"))).head().getTimestamp(0)
    val batchClosed = graft.queries.EventQueries
      .sessionWindowAgg(spark, sf())
      .filter(col("session_end") <= lit(maxTs))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batchClosed).count() === 0)
    assert(batchClosed.exceptAll(streamed).count() === 0)
  }

  test("stream-static enrichment join equals the batch join+aggregate") {
    val streamed = EventsStream.streamStaticEnrichedCounts(
      spark, sf(), "spec_enrich")
    val dim = spark.read.parquet(s"${sf()}/customer.parquet")
      .select(col("c_custkey"), col("c_mktsegment"))
    val batch = Tables.events(spark, sf())
      .join(dim, col("user_id") === col("c_custkey"), "left")
      .groupBy(coalesce(col("c_mktsegment"), lit("UNKNOWN")).as("segment"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value").cast("decimal(38,8)")).cast("double"), 4)
          .as("sum_value"))
    assert(streamed.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streamed).count() === 0)
  }

  test("streaming export manifest equals the batch manifest") {
    val streamed = EventsStream.streamingExportManifest(
      spark, sf(), "spec_manifest")
    val batch = graft.operators.ShardedExport.manifest(
      Tables.documents(spark, sf()).withColumn("n_toks",
        graft.functions.TextFunctions.tokenCount(
          graft.functions.TextFunctions.normalize(col("text")))),
      "doc_id", "n_toks", shards = 8)
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streamed).count() === 0)
  }

  test("streaming Misra-Gries heavy hitters equals batch GROUP BY") {
    // capacity >> cardinality: the custom TypedImperativeAggregate's
    // state-store path (merge across micro-batches) must be exact
    val streamed = EventsStream.streamingHeavyHitters(
      spark, sf(), "spec_hh")
    val batch = Tables.events(spark, sf())
      .groupBy(concat(col("event_type"), lit(":"),
        pmod(col("user_id"), lit(10L)).cast("string")).as("key"))
      .agg(count(lit(1)).as("cnt"))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streamed).count() === 0)
  }

  test("streaming histogram quantile equals the batch operator") {
    // per-(type,bin) count merge is micro-batch-cut invariant, so the
    // drained stream's histogram — and the rank pick over it — must
    // equal the batch HistogramQuantile output row for row
    val streamed = EventsStream.streamingQuantileHist(
      spark, sf(), "spec_qhist")
    val batch = graft.operators.HistogramQuantile.quantiles(
      Tables.events(spark, sf()), "event_type",
      round(col("value") * 100), binWidth = 1000L, perUnit = 100L,
      qs = Seq(("p50", 1, 2), ("p95", 19, 20)))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streamed).count() === 0)
  }

  test("streaming typed-Aggregator moments equal the batch operator") {
    val streamed = EventsStream.streamingTypedMoments(
      spark, sf(), "spec_moments")
    val batch = graft.operators.TypedOps.typedMoments(
      Tables.events(spark, sf()))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streamed).count() === 0)
  }

  test("stream-stream interval join equals the batch self-join") {
    val streamed = EventsStream.viewPurchaseJoinCounts(
      spark, sf(), "spec_ssjoin")
    val e = Tables.events(spark, sf())
    val batch = e.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
      .join(e.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("p_ts")),
        col("v_user") === col("p_user") &&
          col("p_ts") >= col("v_ts") &&
          col("p_ts") <= col("v_ts") + expr("INTERVAL 30 MINUTES"))
      .groupBy(col("v_user").as("user_id"))
      .agg(count(lit(1)).as("n_pairs"))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streamed).count() === 0)
  }

  test("stream-stream LEFT OUTER interval join applies the watermark cut") {
    val streamed = EventsStream.viewPurchaseLeftOuterCounts(
      spark, sf(), "spec_ssjoin_lo")
    val e = Tables.events(spark, sf())
    val v = e.filter(col("event_type") === "view")
      .select(col("event_id").as("v_id"), col("user_id").as("v_user"),
        col("ts").as("v_ts"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
    val matched = v.join(p,
      col("v_user") === col("p_user") &&
        col("p_ts") >= col("v_ts") &&
        col("p_ts") <= col("v_ts") + expr("INTERVAL 30 MINUTES"))
    // final watermark = min(max view ts, max purchase ts), zero delay
    val wm = v.agg(max(col("v_ts"))).head().getTimestamp(0).getTime.min(
      p.agg(max(col("p_ts"))).head().getTimestamp(0).getTime)
    val expired = v.join(matched.select(col("v_id").as("m_id")).distinct(),
        col("v_id") === col("m_id"), "left_anti")
      .filter(col("v_ts") + expr("INTERVAL 30 MINUTES") <
        lit(new java.sql.Timestamp(wm)))
    val batch = matched.groupBy(col("v_user"))
      .agg(count(lit(1)).as("n_pairs"), lit(0L).as("n_expired"))
      .unionByName(expired.groupBy(col("v_user"))
        .agg(lit(0L).as("n_pairs"), count(lit(1)).as("n_expired")))
      .groupBy(col("v_user").as("user_id"))
      .agg(sum(col("n_pairs")).as("n_pairs"),
        sum(col("n_expired")).as("n_expired"))
    assert(streamed.agg(sum(col("n_expired"))).head().getLong(0) > 0,
      "the outer (eviction-emitted) path must actually fire")
    assert(streamed.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streamed).count() === 0)
  }

  test("transformWithState running totals equal the batch GROUP BY") {
    val streamed = graft.streaming.StatefulCounters.runningTotals(
      spark, sf(), nChunks = 4, queryName = "spec_tws")
    val batch = Tables.events(spark, sf())
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("sum_cents"))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streamed).count() === 0)
    // the RocksDB provider override must not leak into the session
    // (getOption surfaces the conf DEFAULT after unset — assert the
    // override itself is gone, not literal emptiness)
    assert(!spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
      .exists(_.contains("RocksDB")))
  }

  test("streaming PIT enrichment equals the batch interval join") {
    val streamed = EventsStream.streamingPitEnrich(
      spark, sf(), "spec_pit")
    val iv = graft.queries.RelationalQueries.q28Scd2(spark, sf())
      .select(col("custkey"), col("prio"),
        col("valid_from"), col("valid_to"))
    val batch = Tables.events(spark, sf())
      .select(col("user_id"), to_date(col("ts")).as("d"), col("value"))
      .join(iv, col("user_id") === col("custkey") &&
        col("valid_from") <= col("d") && col("d") < col("valid_to"),
        "left")
      .groupBy(coalesce(col("prio"), lit("NONE")).as("regime"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value").cast("decimal(38,8)")).cast("double"), 4)
          .as("sum_value"))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streamed).count() === 0)
    // every event lands in exactly one regime (intervals tile)
    assert(streamed.agg(sum("n_events")).head().getLong(0) ===
      Tables.events(spark, sf()).count())
  }

  test("PIT containment join: pre-first-interval probes keep NONE") {
    import spark.implicits._
    val iv = Seq(
      (7L, "A", java.sql.Date.valueOf("2024-02-01"),
        java.sql.Date.valueOf("2024-03-01")),
      (7L, "B", java.sql.Date.valueOf("2024-03-01"),
        java.sql.Date.valueOf("9999-12-31")))
      .toDF("custkey", "prio", "valid_from", "valid_to")
    val probes = Seq(
      (7L, java.sql.Date.valueOf("2024-01-15")), // before first → NONE
      (7L, java.sql.Date.valueOf("2024-02-15")), // inside A
      (7L, java.sql.Date.valueOf("2024-03-01")), // boundary → B
      (9L, java.sql.Date.valueOf("2024-02-15"))) // unknown key → NONE
      .toDF("user_id", "d")
    val out = probes.join(iv,
        col("user_id") === col("custkey") &&
          col("valid_from") <= col("d") && col("d") < col("valid_to"),
        "left")
      .select(col("user_id"), col("d"),
        coalesce(col("prio"), lit("NONE")).as("regime"))
      .collect().map(r => (r.getLong(0), r.getDate(1).toString,
        r.getString(2))).toSet
    assert(out === Set(
      (7L, "2024-01-15", "NONE"), (7L, "2024-02-15", "A"),
      (7L, "2024-03-01", "B"), (9L, "2024-02-15", "NONE")))
  }

  test("timer sessionizer equals the native session_window stream") {
    val timed = graft.streaming.StatefulSessionizer.sessions(
      spark, sf(), nChunks = 4, queryName = "spec_timer_sess")
    val native = EventsStream.streamingSessionWindows(
      spark, sf(), "spec_swin_vs_timer")
    assert(timed.count() > 0)
    assert(timed.exceptAll(native).count() === 0)
    assert(native.exceptAll(timed).count() === 0)
    // the watermark cut must actually withhold each user's open tail
    val allSessions = graft.queries.EventQueries
      .sessionWindowAgg(spark, sf()).count()
    assert(timed.count() < allSessions)
  }

  test("sessionize: single user with one gap splits into two sessions") {
    val out = graft.queries.EventQueries.sessionize(spark, sf())
    assert(out.count() > 0)
    // every user's session count is between 1 and its event count
    assert(out.filter(col("n_sessions") < 1 ||
      col("n_sessions") > col("n_events")).count() === 0)
  }
}
