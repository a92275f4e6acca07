package graft

import org.apache.spark.sql.functions._

/** The README "Quickstart" examples, compiled and executed — one per
  * pillar (ETL parity, dedup→pack→export, ANN, streaming). KEEP THE
  * CODE BLOCKS IN SYNC WITH README.md: this spec exists so a pasted
  * quickstart can never rot against the API.
  */
class QuickstartSpec extends SparkSpec {

  private val sfDir = sf() // /root/testdata/sf0.001

  test("quickstart 1: taxi ETL — gzip \\N-null CSV in, atomic " +
      "month-partitioned snapshot out, query the committed table") {
    val work = java.nio.file.Files
      .createTempDirectory("graft_quickstart_etl").toString
    // --- README block 1 (adapted paths only) ---
    import graft.etl.{CsvExport, SnapshotStore}
    // any month-partitionable frame; here: orders with a derived month
    val orders = Tables.orders(spark, sfDir)
      .withColumn("order_month", date_format(col("o_orderdate"), "yyyy-MM"))
    // month-partitioned, time-sorted, committed by ONE atomic pointer
    // swap — a reader racing this sees the old or the new table, whole
    SnapshotStore.write(orders, s"$work/orders_table",
      partCol = "order_month", sortCol = "o_orderdate")
    // restate one month atomically (cost ∝ that month only)
    val lastMonth = orders.agg(max("order_month")).head().getString(0)
    SnapshotStore.overwritePartitions(
      orders.filter(col("order_month") === lastMonth),
      s"$work/orders_table", partCol = "order_month", sortCol = "o_orderdate")
    // resolve the current snapshot and query it
    val table = SnapshotStore.read(spark, s"$work/orders_table")
    val perMonth = table.groupBy("order_month").count()
    // gzip-sharded \N-null CSV export, also behind an atomic pointer
    SnapshotStore.commitDir(s"$work/export") { dir =>
      CsvExport.write(table.select("o_orderkey", "o_totalprice"), dir,
        shards = 4)
    }
    // --- end README block ---
    assert(perMonth.count() > 0)
    assert(table.count() === orders.count())
    assert(SnapshotStore.currentDir(s"$work/export").isDefined)
  }

  test("quickstart 1b: MERGE commit + pure SQL with time travel over " +
      "the committed snapshot table") {
    val work = java.nio.file.Files
      .createTempDirectory("graft_quickstart_sql").toString
    import graft.etl.SnapshotStore
    val orders = Tables.orders(spark, sfDir)
      .withColumn("order_month", date_format(col("o_orderdate"), "yyyy-MM"))
    SnapshotStore.write(orders, s"$work/orders_table",
      partCol = "order_month", sortCol = "o_orderdate")
    // a tiny changeset: delete one order, double another's price
    val changes = orders.filter(col("o_orderkey").isin(1L, 2L))
      .withColumn("o_totalprice",
        when(col("o_orderkey") === 2L, col("o_totalprice") * 2)
          .otherwise(col("o_totalprice")))
      .withColumn("_delete", col("o_orderkey") === 1L)
    // --- README block 1b (adapted paths only) ---
    import graft.operators.MergeInto
    import graft.sources.GraftSnapshotCatalog
    MergeInto.mergeCommit(spark, s"$work/orders_table", changes,
      key = "o_orderkey", deleteFlag = "_delete",
      partCol = "order_month", sortCol = "o_orderdate")
    spark.conf.set("spark.sql.catalog.snap",
      classOf[GraftSnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.snap.warehouse", work)
    val perMonth = spark.sql(
      "SELECT order_month, count(*) FROM snap.orders_table GROUP BY 1")
    val asOf1 = spark.sql(
      "SELECT count(*) FROM snap.orders_table VERSION AS OF 1")
    // README's "INSERT INTO snap.orders_table SELECT ..." — a concrete
    // SELECT here: re-insert order 1 (deleted by the MERGE above)
    spark.sql(
      "INSERT INTO snap.orders_table " +
        "SELECT o.*, date_format(o.o_orderdate, 'yyyy-MM') AS order_month " +
        s"FROM parquet.`$sfDir/orders.parquet` o WHERE o.o_orderkey = 1")
    // README's atomic DROP PARTITION: one metadata-only commit (the
    // month comes from the TABLE — the MERGE's +40-day updates can
    // push rows past the raw data's max month)
    val lastMonth = spark
      .sql("SELECT max(order_month) FROM snap.orders_table")
      .head().getString(0)
    val preDelete = spark.sql("SELECT count(*) FROM snap.orders_table")
      .head().getLong(0)
    val lastMonthRows = spark.sql("SELECT count(*) FROM " +
      s"snap.orders_table WHERE order_month = '$lastMonth'")
      .head().getLong(0)
    spark.sql(
      s"DELETE FROM snap.orders_table WHERE order_month = '$lastMonth'")
    // --- end README block ---
    assert(perMonth.count() > 0)
    assert(asOf1.head().getLong(0) === orders.count()) // pre-merge state
    // post-merge / pre-insert snapshot: the delete must be visible on
    // its own — without this, a no-op MERGE and a zero-row INSERT would
    // cancel and the final net-count check below couldn't tell
    assert(spark.sql("SELECT count(*) FROM snap.orders_table VERSION AS OF 2")
      .head().getLong(0) === orders.count() - 1) // the delete landed
    // post-insert snapshot: order 1 re-added, last month still present
    assert(spark.sql("SELECT count(*) FROM snap.orders_table VERSION AS OF 3")
      .head().getLong(0) === orders.count())
    // after the partition DELETE: the whole last month gone in one
    // pointer swap, everything else untouched
    assert(lastMonthRows > 0)
    assert(spark.sql("SELECT count(*) FROM snap.orders_table")
      .head().getLong(0) === preDelete - lastMonthRows)
  }

  test("quickstart 2: corpus pipeline — near-dup dedup, pack to " +
      "sequences, export") {
    // --- README block 2 ---
    import graft.operators.{Dedup, Packing}
    val docs = Tables.documents(spark, sfDir) // (doc_id, text, lang, …)
    // banded MinHash+LSH: candidate pairs only within shared LSH
    // buckets (never corpus²), verified at jaccard ≥ 0.8
    val dupPairs = Dedup.minhashDedup(docs, "doc_id", "text",
      threshold = 0.8)
    // keep the lower id of every duplicate pair (drop the id_b side)
    val survivors = docs.join(
      dupPairs.select(greatest(col("id_a"), col("id_b")).as("doc_id"))
        .distinct(),
      Seq("doc_id"), "left_anti")
    // pack survivors into ≤2048-token training sequences (next-fit,
    // shard-local fold — one shuffle)
    val packed = Packing.nextFitPack(
      survivors.withColumn("n_toks", size(split(col("text"), "\\s+"))),
      "doc_id", "n_toks", budget = 2048, shards = 8)
    // --- end README block ---
    assert(survivors.count() > 0 && survivors.count() <= docs.count())
    assert(packed.columns.contains("seq_id"))
    assert(packed.count() === survivors.count())
  }

  test("quickstart 3: similarity search — exact top-k baseline, " +
      "LSH-bucketed scale path") {
    // --- README block 3 ---
    import graft.operators.SimilaritySearch
    val emb = Tables.embeddings(spark, sfDir) // (vec_id, embedding[64])
    val probes = emb.filter(col("vec_id") < 3)
    // exact cosine top-5: the correctness baseline (probes broadcast,
    // corpus scanned once)
    val exact = SimilaritySearch.bruteForceTopK(
      emb, probes, "vec_id", "embedding", k = 5)
    // hyperplane-LSH buckets: probe cost = matching buckets, not the
    // corpus — the 100 TB path
    val approx = SimilaritySearch.lshTopK(
      emb, probes, "vec_id", "embedding", k = 5, planes = 4, tables = 8)
    // --- end README block ---
    assert(exact.groupBy("probe_id").count()
      .agg(max("count")).head().getLong(0) <= 5)
    assert(approx.count() > 0)
  }

  test("quickstart 4: streaming — watermarked hourly stats over a " +
      "live event stream equals the batch aggregation") {
    // --- README block 4 ---
    import graft.streaming.EventsStream
    // file stream → 1 h watermark → windowed agg → queryable table
    val live = EventsStream.hourlyStats(spark, sfDir,
      queryName = "quickstart_hourly")
    // --- end README block ---
    val batch = Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
    assert(live.count() === batch.count())
    assert(live.agg(sum("cnt")).head().getLong(0) ===
      Tables.events(spark, sfDir).count())
  }
}
