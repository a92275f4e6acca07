package graft.queries

import graft.Tables
import graft.etl.{BucketedTables, CsvExport, MergeTreeWriter, RawCsvSource, SnapshotStore, ZOrderLayout}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** ETL sink/source operators exercised as round-trips over the testdata
  * so the driver's DuckDB oracle can check them end-to-end: what went
  * through the sink+source must aggregate identically to the original
  * parquet (SURVEY.md §2.1 S1-S5).
  */
object EtlQueries {

  type Q = (SparkSession, String) => DataFrame

  private def tmp(name: String, sfDir: String): String =
    s"${sys.props("java.io.tmpdir")}/graft_${name}_${sfDir.hashCode.toHexString}"

  private val csvSchema = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_linenumber", IntegerType),
    StructField("l_quantity", DoubleType),
    StructField("l_returnflag", StringType),
    StructField("l_shipdate", TimestampType)))

  /** Gzip-sharded CSV export (S5) → `\N`-null CSV source (S1/S2)
    * round-trip. Nulls are synthesized (returnflag 'N' → NULL) so the
    * `\N` token path is actually exercised; the aggregate must match
    * DuckDB computing the same nullification on the original parquet. */
  def csvRoundtrip: Q = (s, d) => {
    val out = tmp("csv", d)
    val li = Tables.lineitem(s, d).select(
      col("l_orderkey"), col("l_linenumber"),
      col("l_quantity"),
      nullif(col("l_returnflag"), lit("N")).as("l_returnflag"),
      col("l_shipdate"))
    CsvExport.write(li, out, shards = 8)
    RawCsvSource.read(s, out, csvSchema)
      .agg(
        count(lit(1)).as("cnt"),
        count(col("l_returnflag")).as("nonnull_flags"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        round(sum(col("l_quantity").cast("decimal(38,8)")).cast("double"), 4)
          .as("sum_qty"),
        max(col("l_shipdate")).as("max_ship"))
  }

  /** Month-partitioned, time-sorted parquet sink (S4, the MergeTree
    * analogue) → read-back → per-month integrity aggregate. */
  def mergetreeRoundtrip: Q = (s, d) => {
    val out = tmp("mergetree", d)
    val li = Tables.lineitem(s, d)
      .withColumn("ship_month", date_format(col("l_shipdate"), "yyyy-MM"))
    MergeTreeWriter.write(li, out, monthCol = "ship_month",
      sortCol = "l_shipdate")
    MergeTreeWriter.read(s, out)
      .groupBy("ship_month")
      .agg(count(lit(1)).as("cnt"),
        min(col("l_shipdate")).as("min_ship"),
        max(col("l_shipdate")).as("max_ship"))
  }

  private val bucketed = scala.collection.mutable.Set[String]()

  /** Bucket lineitem and orders on the join key once per (JVM, sfDir);
    * returns the two table names. */
  def prepareBucketed(s: SparkSession, d: String): (String, String) =
    synchronized {
      val tag = d.hashCode.toHexString
      val (li, ord) = (s"li_bkt_$tag", s"ord_bkt_$tag")
      if (!bucketed.contains(tag)) {
        BucketedTables.write(Tables.lineitem(s, d), li,
          s"${tmp("li_bkt", d)}", "l_orderkey", buckets = 16)
        BucketedTables.write(Tables.orders(s, d), ord,
          s"${tmp("ord_bkt", d)}", "o_orderkey", buckets = 16)
        bucketed += tag
      }
      (li, ord)
    }

  /** Fact⋈fact join on co-located bucketed tables (zero exchanges — the
    * write-time shuffle is amortized across every subsequent join):
    * revenue per order priority. Result is layout-independent, so the
    * DuckDB oracle is the plain join on the original parquet. */
  def bucketedJoin: Q = (s, d) => {
    val (li, ord) = prepareBucketed(s, d)
    BucketedTables.cogroupJoin(s, li, ord, "l_orderkey", "o_orderkey")
      .groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("n_items"),
        round(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(38,8)")).cast("double"), 2).as("revenue"))
  }

  /** Z-order layout (multi-dimensional MergeTree analogue) under the
    * driver gate: orders written along the Morton curve over
    * (o_custkey, floor(o_totalprice)), read back, and every row's
    * z-value recomputed from the round-tripped data — the oracle
    * replays the exact normalize+interleave integer arithmetic, so both
    * the sink/source path and the curve math are hash-checked. The
    * pruning property the layout exists for (tight per-file min/max on
    * BOTH dimensions) is asserted in ZOrderLayoutSpec. */
  def zorderRoundtrip: Q = (s, d) => {
    val out = tmp("zorder", d)
    val o = Tables.orders(s, d).select(col("o_orderkey"),
      col("o_custkey"), floor(col("o_totalprice")).cast("long").as("price_l"))
    ZOrderLayout.writeZOrdered(o, "o_custkey", "price_l", out, nFiles = 8)
    val back = s.read.parquet(out)
    val stats = back.agg(
      min(col("o_custkey")).as("amin"), max(col("o_custkey")).as("amax"),
      min(col("price_l")).as("bmin"), max(col("price_l")).as("bmax"))
    back.crossJoin(broadcast(stats))
      .select(col("o_orderkey"),
        ZOrderLayout.zValue(col("o_custkey"), col("amin"), col("amax"),
          col("price_l"), col("bmin"), col("bmax"), bits = 16).as("zv"))
  }

  /** The custom DataSource V2 under the gate: 100k generated trips,
    * aggregated per cab type. The grouped query needs 3 of 5 columns,
    * so the V2 column pruning keeps pickup_ts/trip_id out of the scan
    * (PlanAudit asserts it); DuckDB replays the generator arithmetic
    * over generate_series. */
  def genSourceAgg: Q = (s, _) =>
    s.read.format("graft.sources.TripsGenProvider")
      .option("rows", 100000L).option("slices", 8).load()
      .groupBy(col("cab_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("fare_cents")).as("total_fare_cents"),
        round(avg(col("passenger_count").cast("double")), 6)
          .as("avg_passengers"))
      .orderBy("cab_type")

  private val docsSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Per-language aggregate with a rolling-hash content checksum — the
    * lossless-round-trip gate shared by the JSONL and ORC lanes (the
    * oracle computes the identical aggregate straight from parquet, so
    * a format path passes only if it preserved every character). */
  private def contentChecksumAgg(back: DataFrame): DataFrame =
    back.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"),
        sum(graft.functions.TextFunctions.rollingHash(col("text")))
          .as("content_sum"))
      .orderBy("lang")

  /** Gzip-sharded JSONL round-trip — the LLM-corpus interchange format
    * (one JSON object per line, the shape every public text dataset
    * ships in). Documents are hash-repartitioned into 4 shards, written
    * as gzip JSONL, and read back under an EXPLICIT schema (schema-on-
    * read discipline: inference costs a second pass at 100 TB and can
    * drift per shard); the [[contentChecksumAgg]] gate proves
    * byte-level text survival incl. escaped multi-byte zh/es text. */
  def jsonlRoundtrip: Q = (s, d) => {
    val out = tmp("jsonl", d)
    Tables.documents(s, d).repartition(4, col("doc_id"))
      .write.mode("overwrite").option("compression", "gzip").json(out)
    contentChecksumAgg(s.read.schema(docsSchema).json(out))
  }

  /** ORC round-trip under the same content-checksum gate — the second
    * columnar format tier beside parquet (zlib-compressed, 4 shards;
    * ORC carries its own schema, so the read declares none). */
  def orcRoundtrip: Q = (s, d) => {
    val out = tmp("orc", d)
    Tables.documents(s, d).repartition(4, col("doc_id"))
      .write.mode("overwrite").option("compression", "zlib").orc(out)
    contentChecksumAgg(s.read.orc(out))
  }

  /** The V2 FILTER pushdown under the gate: trip_id range conjuncts are
    * absorbed into the generator's [lo, hi) BEFORE partition planning,
    * so 5k of 100k rows are ever generated and the Filter node is gone
    * from the plan (TripsGenSourceSpec + PlanAudit assert both); min/max
    * trip_id in the output prove the absorbed range semantics exactly.
    * passenger_count/pickup_ts additionally stay out of the scan. */
  def genSourcePruned: Q = (s, _) =>
    s.read.format("graft.sources.TripsGenProvider")
      .option("rows", 100000L).option("slices", 8).load()
      .filter(col("trip_id") >= 90000L && col("trip_id") < 95000L)
      .groupBy(col("cab_type"))
      .agg(count(lit(1)).as("n"),
        min(col("trip_id")).as("min_id"), max(col("trip_id")).as("max_id"),
        sum(col("fare_cents")).as("total_fare_cents"))
      .orderBy("cab_type")

  /** Schema evolution across table generations: generation 1 was
    * written before the `o_orderpriority` column existed; generation 2
    * carries it. `mergeSchema` unifies the footers at read time (old
    * rows NULL-fill the new column — no rewrite of historical data,
    * the only sane upgrade path for a 100 TB table), and the aggregate
    * distinguishes pre-upgrade rows explicitly. */
  def schemaEvolution: Q = (s, d) => {
    val out = tmp("schema_evo", d)
    val o = Tables.orders(s, d)
    o.filter(pmod(col("o_orderkey"), lit(2)) === 0)
      .select("o_orderkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$out/g1")
    o.filter(pmod(col("o_orderkey"), lit(2)) === 1)
      .select("o_orderkey", "o_totalprice", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$out/g2")
    s.read.option("mergeSchema", "true").parquet(s"$out/g1", s"$out/g2")
      .groupBy(coalesce(col("o_orderpriority"), lit("<pre-upgrade>"))
        .as("prio"))
      .agg(count(lit(1)).as("cnt"),
        round(sum(col("o_totalprice").cast("decimal(38,8)"))
          .cast("double"), 4).as("total"))
  }

  /** Malformed-record handling (the PERMISSIVE-mode ETL surface): a
    * deterministic fraction of CSV rows is corrupted (numeric field
    * replaced by text), the read captures them in `_corrupt_record`
    * with every data field nulled, and the report counts both
    * populations plus the clean-row aggregate. The oracle replays the
    * corruption rule on the original parquet — good/corrupt splits and
    * the clean sum must agree exactly. */
  def csvBadRecords: Q = (s, d) => {
    val out = tmp("badcsv", d)
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      .withColumn("qty_str",
        when(pmod(col("l_orderkey") + col("l_linenumber"), lit(7)) === 0,
          lit("oops")).otherwise(col("l_quantity").cast("string")))
      .select(concat_ws(",", col("l_orderkey"), col("l_linenumber"),
        col("qty_str")).as("line"))
      .write.mode("overwrite").text(out)
    val schema = StructType(Seq(
      StructField("l_orderkey", LongType),
      StructField("l_linenumber", IntegerType),
      StructField("l_quantity", DoubleType),
      StructField("_corrupt_record", StringType)))
    s.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(out)
      .agg(count(lit(1)).as("total_rows"),
        count(col("_corrupt_record")).as("corrupt_rows"),
        count(col("l_quantity")).as("good_rows"),
        round(sum(col("l_quantity").cast("decimal(38,8)"))
          .cast("double"), 4).as("sum_qty"))
  }

  private val dppPrepared = scala.collection.mutable.Set[String]()

  /** Month-partitioned lineitem + a tiny month→quarter dim, written
    * once per (JVM, sfDir). The dim is a real parquet table (not a
    * local relation) so its selective filter survives into the
    * optimized plan where the `PartitionPruning` rule looks for it —
    * the same reason a production calendar dim is a table. */
  def prepareDpp(s: SparkSession, d: String): (String, String) =
    synchronized {
      val (factOut, dimOut) = (tmp("dpp_fact", d), tmp("dpp_dim", d))
      if (!dppPrepared.contains(d)) {
        Tables.lineitem(s, d)
          .withColumn("ship_month", date_format(col("l_shipdate"), "yyyy-MM"))
          .write.mode("overwrite").partitionBy("ship_month").parquet(factOut)
        val months = for { y <- 1995 to 2001; m <- 1 to 12 }
          yield (f"$y-$m%02d", s"$y-Q${(m - 1) / 3 + 1}")
        s.createDataFrame(months).toDF("ship_month", "quarter")
          .coalesce(1).write.mode("overwrite").parquet(dimOut)
        dppPrepared += d
      }
      (factOut, dimOut)
    }

  /** Dynamic partition pruning (the partition-level runtime filter,
    * complementing the row-level Bloom pruning in
    * [[graft.operators.RuntimeFilters]]): the fact table is stored
    * partitioned on the join key's derivation (`ship_month`, the
    * MergeTree `PARTITION BY toYYYYMM` analogue the reference declares
    * in README.md:561-565), the calendar dim carries the selective
    * predicate, and Catalyst's `PartitionPruning` rule turns the
    * broadcast dim into `dynamicpruningexpression(...)` inside the
    * scan's PartitionFilters — at 100 TB the scan reads 3 months of
    * files, not 84, before a single row is decoded. DppBloomSpec
    * asserts the pruning subquery is actually in the executed plan. */
  def dppJoin: Q = (s, d) => {
    val (factOut, dimOut) = prepareDpp(s, d)
    val fact = s.read.parquet(factOut)
    val dim = s.read.parquet(dimOut).filter(col("quarter") === "1996-Q2")
    fact.join(broadcast(dim), Seq("ship_month"))
      .groupBy("ship_month")
      .agg(count(lit(1)).as("cnt"),
        round(sum(col("l_quantity").cast("decimal(38,8)"))
          .cast("double"), 2).as("sum_qty"))
  }

  /** Idempotent month backfill via dynamic partition overwrite — the
    * MergeTree operational replay (DROP PARTITION + re-INSERT of a
    * corrected month; ClickHouse practice, an extension — the
    * reference's own replay re-runs its import loop, README.md:527-532)
    * without touching any other month:
    * full load, then a RESTATED version of the latest month lands
    * (late dedup removed every 10th order, a 5.00 adjustment applied),
    * and `MergeTreeWriter.overwritePartitions` replaces exactly that
    * partition. The final per-month aggregate must show the corrected
    * month restated and every other month byte-identical to the
    * original load — which is precisely what the DuckDB oracle
    * replays. Job cost is proportional to the restated month only. */
  /** orders + derived month, and the corrected restatement of its
    * latest month (every 10th order dropped, +5.00 adjustment) — ONE
    * definition shared by the in-place and snapshot backfill lanes, so
    * a tweak here cannot desynchronize either lane from their shared
    * oracle replay. */
  private def ordersWithMonth(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .withColumn("order_month", date_format(col("o_orderdate"), "yyyy-MM"))

  private def correctedLastMonth(orders: DataFrame): DataFrame = {
    val lastMonth = orders.agg(max(col("order_month"))).head().getString(0)
    orders
      .filter(col("order_month") === lastMonth)
      .filter(pmod(col("o_orderkey"), lit(10)) =!= 0)
      .withColumn("o_totalprice", col("o_totalprice") + lit(5.0))
  }

  def backfillOverwrite: Q = (s, d) => {
    val out = tmp("backfill", d)
    val orders = ordersWithMonth(s, d)
    MergeTreeWriter.write(orders, out, monthCol = "order_month",
      sortCol = "o_orderdate")
    MergeTreeWriter.overwritePartitions(correctedLastMonth(orders), out,
      monthCol = "order_month", sortCol = "o_orderdate")
    monthAgg(MergeTreeWriter.read(s, out))
  }

  /** Snapshot-store lanes share one two-snapshot history per (JVM,
    * sfDir): full load → atomic partition backfill of the latest
    * month. Returns (root, firstSnapshotId). Rebuilt fresh per JVM so
    * snapshot ids are deterministic whatever earlier runs left in tmp. */
  private val snapPrepared = scala.collection.mutable.Map[String, Long]()
  private def prepareSnapshotHistory(s: SparkSession, d: String)
      : (String, Long) = {
    // PID-suffixed root: the rm+rebuild below is guarded only by this
    // JVM's monitor, so two JVMs sharing java.io.tmpdir (Bench + a
    // plain Verify running concurrently) would otherwise rm the
    // snaproot out from under each other's reads/commits — the commit
    // lock does not cover a raw recursive delete. A per-process root
    // makes the dir single-writer by construction (and
    // processScratchRoot sweeps dead-PID siblings, so repeated runs
    // don't grow tmp unboundedly); lanes within one JVM still share
    // the one prepared history.
    val root = graft.util.Fs.processScratchRoot("snaproot",
      s"_${d.hashCode.toHexString}")
    synchronized {
      snapPrepared.get(root) match {
        case Some(id1) => (root, id1)
        case None =>
          graft.util.Fs.deleteRecursively(new java.io.File(root))
          val orders = ordersWithMonth(s, d)
          val id1 = SnapshotStore.write(orders, root,
            partCol = "order_month", sortCol = "o_orderdate")
          SnapshotStore.overwritePartitions(correctedLastMonth(orders),
            root, partCol = "order_month", sortCol = "o_orderdate")
          snapPrepared(root) = id1
          (root, id1)
      }
    }
  }

  /** Deterministic MERGE changeset over orders (all three clauses, all
    * DuckDB-replayable):
    *   - DELETE every key ≡ 0 (mod 20);
    *   - UPDATE every key ≡ 10 (mod 20): price +10.00 and the order
    *     date shifted +40 days — most such rows MOVE to a different
    *     month partition, exercising the cross-partition rewrite;
    *   - INSERT a new row (key + 2e9, price +0.50) for every key
    *     ≡ 7 (mod 100).
    * Disjoint key classes keep the MERGE unique-key precondition. */
  private def mergeChangeset(orders: DataFrame): DataFrame = {
    val deletes = orders.filter(pmod(col("o_orderkey"), lit(20)) === 0)
      .withColumn("_delete", lit(true))
    val updates = orders.filter(pmod(col("o_orderkey"), lit(20)) === 10)
      .withColumn("o_totalprice", col("o_totalprice") + lit(10.0))
      .withColumn("o_orderdate",
        col("o_orderdate") + expr("INTERVAL 40 DAYS"))
      .withColumn("order_month", date_format(col("o_orderdate"), "yyyy-MM"))
      .withColumn("_delete", lit(false))
    val inserts = orders.filter(pmod(col("o_orderkey"), lit(100)) === 7)
      .withColumn("o_orderkey", col("o_orderkey") + lit(2000000000L))
      .withColumn("o_totalprice", col("o_totalprice") + lit(0.5))
      .withColumn("_delete", lit(false))
    deletes.unionByName(updates).unionByName(inserts)
  }

  /** One MERGE-committed snapshot history per (JVM, sfDir):
    * full load → [[MergeInto.mergeCommit]] of [[mergeChangeset]].
    * PID-suffixed root for the same cross-JVM-isolation reason as
    * [[prepareSnapshotHistory]]. */
  private val snapMergePrepared = scala.collection.mutable.Set[String]()
  private def prepareSnapshotMerge(s: SparkSession, d: String): String = {
    val root = graft.util.Fs.processScratchRoot("snapmerge",
      s"_${d.hashCode.toHexString}")
    synchronized {
      if (!snapMergePrepared.contains(root)) {
        graft.util.Fs.deleteRecursively(new java.io.File(root))
        val orders = ordersWithMonth(s, d)
        SnapshotStore.write(orders, root,
          partCol = "order_month", sortCol = "o_orderdate")
        graft.operators.MergeInto.mergeCommit(s, root,
          mergeChangeset(orders), key = "o_orderkey",
          deleteFlag = "_delete", partCol = "order_month",
          sortCol = "o_orderdate")
        snapMergePrepared += root
      }
    }
    root
  }

  /** MERGE INTO as an atomic snapshot commit: deletes, updates (some
    * moving rows across month partitions) and inserts applied in one
    * copy-on-write commit; untouched months carry by reference. The
    * oracle replays the same three clauses over the raw orders. */
  def snapshotMerge: Q = (s, d) =>
    monthAgg(SnapshotStore.read(s, prepareSnapshotMerge(s, d)))

  /** One SQL-INSERTed snapshot history per (JVM, sfDir): full load via
    * the Scala API, then a PURE-SQL `INSERT INTO` through the catalog
    * (routed into the locked [[SnapshotStore.appendPartitions]], layout
    * resolved from the manifest props — the SQL writer never re-states
    * it). The inserted batch: every key ≡ 3 (mod 50) cloned with
    * key + 3e9 and price + 1.25, selected straight from the parquet
    * source in SQL. */
  private val snapSqlInsPrepared = scala.collection.mutable.Set[String]()
  private def prepareSnapshotSqlInsert(s: SparkSession, d: String): String = {
    val root = graft.util.Fs.processScratchRoot("snapins",
      s"_${d.hashCode.toHexString}")
    synchronized {
      if (!snapSqlInsPrepared.contains(root)) {
        graft.util.Fs.deleteRecursively(new java.io.File(root))
        SnapshotStore.write(ordersWithMonth(s, d), root,
          partCol = "order_month", sortCol = "o_orderdate")
        val table = registerSnapCatalog(s, root)
        s.sql(
          s"""INSERT INTO $table
             |SELECT o_orderkey + 3000000000 AS o_orderkey, o_custkey,
             |       o_orderstatus, o_totalprice + 1.25 AS o_totalprice,
             |       o_orderdate, o_orderpriority,
             |       date_format(o_orderdate, 'yyyy-MM') AS order_month
             |FROM parquet.`$d/orders.parquet`
             |WHERE o_orderkey % 50 = 3""".stripMargin)
        snapSqlInsPrepared += root
      }
    }
    root
  }

  /** Pure-SQL WRITE path: `INSERT INTO` a snapshot table lands an
    * atomic append commit; the SQL read must see original + inserted
    * rows exactly (the oracle replays the insert over raw orders). */
  def snapshotSqlInsert: Q = (s, d) =>
    sqlMonthAgg(s, registerSnapCatalog(s, prepareSnapshotSqlInsert(s, d)))

  /** One SQL-MERGEd snapshot history per (JVM, sfDir): full load, then
    * the [[mergeChangeset]] clauses expressed as a pure-SQL temp view
    * and applied via `CALL graftsnap.system.merge_into` — the
    * procedure resolves the layout from the manifest and routes
    * through the locked [[graft.operators.MergeInto.mergeCommit]]. */
  private val snapSqlMergePrepared = scala.collection.mutable.Set[String]()
  private def prepareSnapshotSqlMerge(s: SparkSession, d: String): String = {
    val root = graft.util.Fs.processScratchRoot("snapsqlmerge",
      s"_${d.hashCode.toHexString}")
    synchronized {
      if (!snapSqlMergePrepared.contains(root)) {
        graft.util.Fs.deleteRecursively(new java.io.File(root))
        SnapshotStore.write(ordersWithMonth(s, d), root,
          partCol = "order_month", sortCol = "o_orderdate")
        registerSnapCatalog(s, root)
        s.sql(
          s"""CREATE OR REPLACE TEMPORARY VIEW graft_sqlmerge_changes AS
             |WITH o AS (SELECT *,
             |    date_format(o_orderdate, 'yyyy-MM') AS order_month
             |  FROM parquet.`$d/orders.parquet`)
             |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
             |       o_orderdate, o_orderpriority, order_month,
             |       true AS _delete
             |  FROM o WHERE o_orderkey % 20 = 0
             |UNION ALL
             |SELECT o_orderkey, o_custkey, o_orderstatus,
             |       o_totalprice + 10.0, o_orderdate + INTERVAL 40 DAYS,
             |       o_orderpriority,
             |       date_format(o_orderdate + INTERVAL 40 DAYS, 'yyyy-MM'),
             |       false
             |  FROM o WHERE o_orderkey % 20 = 10
             |UNION ALL
             |SELECT o_orderkey + 2000000000, o_custkey, o_orderstatus,
             |       o_totalprice + 0.5, o_orderdate, o_orderpriority,
             |       order_month, false
             |  FROM o WHERE o_orderkey % 100 = 7""".stripMargin)
        val name = new java.io.File(root).getName
        s.sql(s"CALL graftsnap.system.merge_into('$name', " +
          "'graft_sqlmerge_changes', 'o_orderkey', '_delete')")
        snapSqlMergePrepared += root
      }
    }
    root
  }

  /** Pure-SQL MERGE path: same three clauses as [[snapshotMerge]], but
    * the changeset is a SQL view and the commit is a SQL CALL — the
    * result must hash-match the Scala-API twin's oracle exactly. */
  def snapshotSqlMerge: Q = (s, d) =>
    sqlMonthAgg(s, registerSnapCatalog(s, prepareSnapshotSqlMerge(s, d)))

  /** One statement-MERGEd history per (JVM, sfDir): full load, then
    * the [[mergeChangeset]] clauses as a NATIVE `MERGE INTO` statement
    * — the standard Delta/Iceberg syntax, intercepted by
    * [[graft.plans.SnapshotMergeRewrite]] into the same locked,
    * stats-pruned commit the CALL form uses. The `AND NOT s._delete`
    * insert guard reproduces the changeset model's "a delete for an
    * absent key is a no-op" exactly, so all three merge entry points
    * (Scala API, CALL, statement) share one oracle. */
  private val snapStmtMergePrepared = scala.collection.mutable.Set[String]()
  private def prepareSnapshotSqlMergeStmt(s: SparkSession, d: String)
      : String = {
    val root = graft.util.Fs.processScratchRoot("snapstmtmerge",
      s"_${d.hashCode.toHexString}")
    synchronized {
      if (!snapStmtMergePrepared.contains(root)) {
        graft.util.Fs.deleteRecursively(new java.io.File(root))
        SnapshotStore.write(ordersWithMonth(s, d), root,
          partCol = "order_month", sortCol = "o_orderdate")
        val table = registerSnapCatalog(s, root)
        s.sql(
          s"""CREATE OR REPLACE TEMPORARY VIEW graft_stmtmerge_changes AS
             |WITH o AS (SELECT *,
             |    date_format(o_orderdate, 'yyyy-MM') AS order_month
             |  FROM parquet.`$d/orders.parquet`)
             |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
             |       o_orderdate, o_orderpriority, order_month,
             |       true AS _delete
             |  FROM o WHERE o_orderkey % 20 = 0
             |UNION ALL
             |SELECT o_orderkey, o_custkey, o_orderstatus,
             |       o_totalprice + 10.0, o_orderdate + INTERVAL 40 DAYS,
             |       o_orderpriority,
             |       date_format(o_orderdate + INTERVAL 40 DAYS, 'yyyy-MM'),
             |       false
             |  FROM o WHERE o_orderkey % 20 = 10
             |UNION ALL
             |SELECT o_orderkey + 2000000000, o_custkey, o_orderstatus,
             |       o_totalprice + 0.5, o_orderdate, o_orderpriority,
             |       order_month, false
             |  FROM o WHERE o_orderkey % 100 = 7""".stripMargin)
        s.sql(
          s"""MERGE INTO $table AS t
             |USING graft_stmtmerge_changes AS s
             |ON t.o_orderkey = s.o_orderkey
             |WHEN MATCHED AND s._delete THEN DELETE
             |WHEN MATCHED THEN UPDATE SET *
             |WHEN NOT MATCHED AND NOT s._delete THEN INSERT *""".stripMargin)
        snapStmtMergePrepared += root
      }
    }
    root
  }

  /** Native `MERGE INTO` statement path: identical clauses, identical
    * oracle — the third entry point into the one merge commit. */
  def snapshotSqlMergeStmt: Q = (s, d) =>
    sqlMonthAgg(s, registerSnapCatalog(s, prepareSnapshotSqlMergeStmt(s, d)))

  /** One conditionally-MERGEd history per (JVM, sfDir): the GENERAL
    * clause shapes the marker model cannot express —
    * TARGET-referencing clause conditions, partial `SET` (unassigned
    * columns keep target values) and mixed target/source SET values,
    * all evaluated on the resolve join
    * ([[graft.operators.MergeInto.mergeGeneralCommit]]):
    *
    *   - `WHEN MATCHED AND t.o_orderstatus = 'F' THEN UPDATE SET
    *     o_totalprice = t.o_totalprice + s.adj` — keys ≡ 2 (mod 20)
    *     with status F get the source adjustment added to the CURRENT
    *     price, every other column kept;
    *   - `WHEN MATCHED AND t.o_totalprice > 200000.0 THEN DELETE` —
    *     non-F matches above the target-price threshold drop
    *     (first-match-wins: an F row matching both takes the UPDATE). */
  private val snapCondMergePrepared = scala.collection.mutable.Set[String]()
  private def prepareSnapshotSqlMergeCond(s: SparkSession, d: String)
      : String = {
    val root = graft.util.Fs.processScratchRoot("snapcondmerge",
      s"_${d.hashCode.toHexString}")
    synchronized {
      if (!snapCondMergePrepared.contains(root)) {
        graft.util.Fs.deleteRecursively(new java.io.File(root))
        SnapshotStore.write(ordersWithMonth(s, d), root,
          partCol = "order_month", sortCol = "o_orderdate")
        val table = registerSnapCatalog(s, root)
        s.sql(
          s"""CREATE OR REPLACE TEMPORARY VIEW graft_condmerge_changes AS
             |SELECT o_orderkey AS k, 3.25 AS adj
             |FROM parquet.`$d/orders.parquet`
             |WHERE o_orderkey % 20 = 2""".stripMargin)
        s.sql(
          s"""MERGE INTO $table AS t
             |USING graft_condmerge_changes AS s
             |ON t.o_orderkey = s.k
             |WHEN MATCHED AND t.o_orderstatus = 'F' THEN
             |  UPDATE SET o_totalprice = t.o_totalprice + s.adj
             |WHEN MATCHED AND t.o_totalprice > 200000.0 THEN DELETE"""
            .stripMargin)
        snapCondMergePrepared += root
      }
    }
    root
  }

  /** General MERGE clause semantics, oracle-replayed: a CASE bump for
    * status-F matched keys, a filtered drop for expensive non-F ones. */
  def snapshotSqlMergeCond: Q = (s, d) =>
    sqlMonthAgg(s, registerSnapCatalog(s, prepareSnapshotSqlMergeCond(s, d)))

  /** One by-source-MERGEd history per (JVM, sfDir): the full-sync
    * shape — the source view DROPS keys ≡ 5 (mod 20), and the MERGE's
    * `WHEN NOT MATCHED BY SOURCE` clause program retires exactly the
    * target rows the source no longer carries (first-match-wins:
    * 1998+ orphans DELETE, older orphans keep a −1.25 markdown), while
    * matched keys ≡ 15 (mod 20) take a source-valued UPDATE. Routed
    * through [[graft.operators.MergeInto.mergeGeneralCommit]]'s
    * by-source program: discovery stats-prunes the orphan scan, the
    * resolve join claims unmatched BASE rows, and the CDC sidecar
    * carries the by-source deletes/updates row-exactly. */
  private val snapBsMergePrepared = scala.collection.mutable.Set[String]()
  private def prepareSnapshotSqlMergeBySource(s: SparkSession, d: String)
      : String = {
    val root = graft.util.Fs.processScratchRoot("snapbsmerge",
      s"_${d.hashCode.toHexString}")
    synchronized {
      if (!snapBsMergePrepared.contains(root)) {
        graft.util.Fs.deleteRecursively(new java.io.File(root))
        SnapshotStore.write(ordersWithMonth(s, d), root,
          partCol = "order_month", sortCol = "o_orderdate")
        val table = registerSnapCatalog(s, root)
        s.sql(
          s"""CREATE OR REPLACE TEMPORARY VIEW graft_bsmerge_src AS
             |SELECT o_orderkey AS k, o_totalprice AS p
             |FROM parquet.`$d/orders.parquet`
             |WHERE o_orderkey % 20 <> 5""".stripMargin)
        s.sql(
          s"""MERGE INTO $table AS t
             |USING graft_bsmerge_src AS s
             |ON t.o_orderkey = s.k
             |WHEN MATCHED AND s.k % 20 = 15 THEN
             |  UPDATE SET o_totalprice = s.p + 4.5
             |WHEN NOT MATCHED BY SOURCE
             |    AND t.o_orderdate >= DATE '1998-01-01' THEN DELETE
             |WHEN NOT MATCHED BY SOURCE THEN
             |  UPDATE SET o_totalprice = t.o_totalprice - 1.25"""
            .stripMargin)
        snapBsMergePrepared += root
      }
    }
    root
  }

  /** `WHEN NOT MATCHED BY SOURCE` full-sync semantics, oracle-replayed
    * over raw orders: source-dropped keys ≡ 5 (mod 20) are deleted
    * (1998+) or marked down (−1.25, older), matched ≡ 15 keys +4.50. */
  def snapshotSqlMergeBySource: Q = (s, d) =>
    sqlMonthAgg(s, registerSnapCatalog(s,
      prepareSnapshotSqlMergeBySource(s, d)))

  /** One SQL-OVERWRITTEN history per (JVM, sfDir): full load, then the
    * corrected-last-month restatement (the [[snapshotBackfill]]
    * replay) applied as a pure-SQL dynamic-partition
    * `INSERT OVERWRITE` — [[graft.plans.SnapshotOverwriteRewrite]]
    * routes the OverwritePartitionsDynamic plan through the locked
    * atomic [[SnapshotStore.overwritePartitions]], so only the
    * restated month is rewritten and every other month carries by
    * manifest reference. Same oracle as `snapshot_backfill`: one
    * restatement, three write APIs (Scala, in-place writer, SQL). */
  private val snapSqlOwPrepared = scala.collection.mutable.Set[String]()
  private def prepareSnapshotSqlOverwrite(s: SparkSession, d: String)
      : String = {
    val root = graft.util.Fs.processScratchRoot("snapsqlow",
      s"_${d.hashCode.toHexString}")
    synchronized {
      if (!snapSqlOwPrepared.contains(root)) {
        graft.util.Fs.deleteRecursively(new java.io.File(root))
        SnapshotStore.write(ordersWithMonth(s, d), root,
          partCol = "order_month", sortCol = "o_orderdate")
        val table = registerSnapCatalog(s, root)
        // dynamic mode scoped to a SESSION CLONE — mutating the shared
        // session's conf (set/restore) would leak dynamic mode to any
        // concurrent INSERT OVERWRITE in the window
        locally {
          val dyn = org.apache.spark.sql.GraftPlanBridge.sessionWithConf(
            s, "spark.sql.sources.partitionOverwriteMode" -> "dynamic")
          dyn.sql(
            s"""INSERT OVERWRITE $table
               |WITH o AS (SELECT *,
               |    date_format(o_orderdate, 'yyyy-MM') AS order_month
               |  FROM parquet.`$d/orders.parquet`),
               | lm AS (SELECT max(order_month) AS m FROM o)
               |SELECT o_orderkey, o_custkey, o_orderstatus,
               |       o_totalprice + 5.0, o_orderdate, o_orderpriority,
               |       order_month
               |FROM o
               |WHERE order_month = (SELECT m FROM lm)
               |  AND o_orderkey % 10 <> 0""".stripMargin)
        }
        snapSqlOwPrepared += root
      }
    }
    root
  }

  /** Pure-SQL dynamic-partition INSERT OVERWRITE: must replay the
    * backfilled state exactly (the `snapshot_backfill` oracle). */
  def snapshotSqlOverwrite: Q = (s, d) =>
    sqlMonthAgg(s, registerSnapCatalog(s, prepareSnapshotSqlOverwrite(s, d)))

  /** One SQL-UPDATEd history per (JVM, sfDir): full load, then a
    * native `UPDATE` statement with a row-granular predicate —
    * [[graft.plans.SnapshotUpdateRewrite]] routes it through the
    * copy-on-write [[graft.operators.RowLevelOps.updateCommit]]: only
    * partitions holding keys ≡ 4 (mod 10) restate, the rest carry by
    * manifest reference (the predicate's date bound keeps most months
    * untouched — PlanAudit checks the carried/restated dir mix). */
  private val snapSqlUpdPrepared = scala.collection.mutable.Set[String]()
  private def prepareSnapshotSqlUpdate(s: SparkSession, d: String)
      : String = {
    val root = graft.util.Fs.processScratchRoot("snapsqlupd",
      s"_${d.hashCode.toHexString}")
    synchronized {
      if (!snapSqlUpdPrepared.contains(root)) {
        graft.util.Fs.deleteRecursively(new java.io.File(root))
        SnapshotStore.write(ordersWithMonth(s, d), root,
          partCol = "order_month", sortCol = "o_orderdate")
        val table = registerSnapCatalog(s, root)
        s.sql(s"UPDATE $table SET o_totalprice = o_totalprice + 7.5 " +
          "WHERE o_orderkey % 10 = 4 AND o_orderdate >= DATE '1998-03-01'")
        snapSqlUpdPrepared += root
      }
    }
    root
  }

  /** Native SQL `UPDATE` path: keys ≡ 4 (mod 10) get +7.50, replayed
    * by the oracle as a CASE over raw orders. */
  def snapshotSqlUpdate: Q = (s, d) =>
    sqlMonthAgg(s, registerSnapCatalog(s, prepareSnapshotSqlUpdate(s, d)))

  /** One row-level-DELETEd history per (JVM, sfDir): full load, then a
    * native `DELETE` whose predicate no partition drop can express
    * (keys ≡ 6 (mod 10)) — [[graft.plans.SnapshotRowDeleteRewrite]]
    * routes it through the copy-on-write
    * [[graft.operators.RowLevelOps.deleteRowsCommit]]. */
  private val snapSqlDelRowsPrepared = scala.collection.mutable.Set[String]()
  private def prepareSnapshotSqlDeleteRows(s: SparkSession, d: String)
      : String = {
    val root = graft.util.Fs.processScratchRoot("snapsqldelr",
      s"_${d.hashCode.toHexString}")
    synchronized {
      if (!snapSqlDelRowsPrepared.contains(root)) {
        graft.util.Fs.deleteRecursively(new java.io.File(root))
        SnapshotStore.write(ordersWithMonth(s, d), root,
          partCol = "order_month", sortCol = "o_orderdate")
        val table = registerSnapCatalog(s, root)
        s.sql(s"DELETE FROM $table WHERE o_orderkey % 10 = 6 " +
          "AND o_orderdate >= DATE '1998-03-01'")
        snapSqlDelRowsPrepared += root
      }
    }
    root
  }

  /** Native row-level SQL `DELETE` path: keys ≡ 6 (mod 10) removed,
    * replayed by the oracle as a NOT filter over raw orders. */
  def snapshotSqlDeleteRows: Q = (s, d) =>
    sqlMonthAgg(s,
      registerSnapCatalog(s, prepareSnapshotSqlDeleteRows(s, d)))

  /** One MERGE-ON-READ history per (JVM, sfDir): full load, then two
    * SMALL-fraction row-level mutations that must take the
    * deletion-vector path (≈1% of each touched month — far under
    * `graft.dv.maxDeleteFraction`):
    *   1. native SQL DELETE of keys ≡ 9 (mod 100);
    *   2. native SQL UPDATE (+6.75) of keys ≡ 17 (mod 100) — the DV
    *      delete + additive post-image part shape.
    * The prepare ASSERTS the vectors actually attached (a routing
    * regression to copy-on-write would silently keep the results green
    * while losing the O(KB)-commit property this lane exists to pin —
    * the commit economics themselves are spec-pinned in
    * [[graft.etl.SnapshotDeletionVectorSpec]]). */
  private val snapDvPrepared = scala.collection.mutable.Set[String]()
  private def prepareSnapshotDv(s: SparkSession, d: String): String = {
    val root = graft.util.Fs.processScratchRoot("snapdv",
      s"_${d.hashCode.toHexString}")
    synchronized {
      if (!snapDvPrepared.contains(root)) {
        graft.util.Fs.deleteRecursively(new java.io.File(root))
        SnapshotStore.write(ordersWithMonth(s, d), root,
          partCol = "order_month", sortCol = "o_orderdate")
        val table = registerSnapCatalog(s, root)
        s.sql(s"DELETE FROM $table WHERE o_orderkey % 100 = 9")
        s.sql(s"UPDATE $table SET o_totalprice = o_totalprice + 6.75 " +
          "WHERE o_orderkey % 100 = 17")
        val m = SnapshotStore.current(root).get
        require(m.entries.exists(_.dv.isDefined),
          "snapshot_dv lanes: the small-fraction DML did not attach " +
            "deletion vectors — merge-on-read routing regressed")
        snapDvPrepared += root
      }
    }
    root
  }

  /** Merge-on-read DELETE end to end: the DV-applied scan must drop
    * exactly the vectored rows — hash-matched against a DuckDB replay
    * (one leaked deleted row, or one over-deleted position, is a
    * count/hash mismatch). */
  def snapshotDvDelete: Q = (s, d) =>
    sqlMonthAgg(s, registerSnapCatalog(s, prepareSnapshotDv(s, d)))

  /** Merge-on-read UPDATE end to end, read through a DIFFERENT
    * projection (priority grain) so the additive post-image parts are
    * verified independently of the month aggregate. */
  def snapshotDvUpdate: Q = (s, d) => {
    val table = registerSnapCatalog(s, prepareSnapshotDv(s, d))
    s.sql(s"""SELECT o_orderpriority, count(*) AS cnt,
             | round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,8)))
             |   AS DOUBLE), 4) AS sum_price
             |FROM $table GROUP BY o_orderpriority""".stripMargin)
  }

  /** One TARGETED-MAINTENANCE history per (JVM, sfDir): full load,
    * then — pre-1997 months ONLY — an appended clone batch
    * (multi-part values) and a small-fraction SQL DELETE (deletion
    * vectors), then ONE [[SnapshotStore.rewriteDataFiles]] pass. The
    * prepare ASSERTS the economics the lane exists to pin (a silent
    * regression to full-table rewrite would stay hash-green): every
    * ≥1997 month's dir carried BY REFERENCE (same dir strings —
    * maintenance is O(dirty data), not O(table)), every value folded
    * to one vector-free entry, and the reader-era requirement lifted
    * by folding the last vector. */
  private val snapRwPrepared = scala.collection.mutable.Set[String]()
  private def prepareSnapshotRewrite(s: SparkSession, d: String): String = {
    val root = graft.util.Fs.processScratchRoot("snaprw",
      s"_${d.hashCode.toHexString}")
    synchronized {
      if (!snapRwPrepared.contains(root)) {
        graft.util.Fs.deleteRecursively(new java.io.File(root))
        val o = ordersWithMonth(s, d)
        SnapshotStore.write(o, root, partCol = "order_month",
          sortCol = "o_orderdate")
        val cut = java.sql.Timestamp.valueOf("1997-01-01 00:00:00")
        val clones = o
          .filter(col("o_orderkey") % 50 === 21 &&
            col("o_orderdate") < lit(cut))
          .withColumn("o_orderkey", col("o_orderkey") + lit(8000000000L))
          .withColumn("o_totalprice", col("o_totalprice") + lit(0.5))
        SnapshotStore.appendPartitions(clones, root,
          partCol = "order_month", sortCol = "o_orderdate")
        val table = registerSnapCatalog(s, root)
        s.sql(s"DELETE FROM $table WHERE o_orderkey % 100 = 9 " +
          "AND o_orderdate < TIMESTAMP'1997-01-01 00:00:00'")
        val pre = SnapshotStore.current(root).get
        require(pre.entries.exists(_.dv.isDefined),
          "snapshot_rewrite_files: the small-fraction DELETE did not " +
            "attach deletion vectors — merge-on-read routing regressed")
        val cleanDirs = pre.entries
          .filter(_.value >= "1997-01").map(_.dir).sorted
        SnapshotStore.rewriteDataFiles(s, root)
        val m = SnapshotStore.current(root).get
        require(m.entries.filter(_.value >= "1997-01").map(_.dir).sorted
            == cleanDirs,
          "snapshot_rewrite_files: clean months must carry BY " +
            "REFERENCE — targeted maintenance regressed to a full " +
            "rewrite")
        require(m.entries.groupBy(_.value).forall(_._2.size == 1) &&
            m.entries.forall(_.dv.isEmpty),
          "snapshot_rewrite_files: dirty months must fold to one " +
            "vector-free entry per value")
        require(!m.props.contains(SnapshotStore.ReaderVersionProp),
          "snapshot_rewrite_files: folding the last vector must lift " +
            "the reader-era requirement")
        snapRwPrepared += root
      }
    }
    root
  }

  /** Targeted maintenance end to end (Iceberg `rewrite_data_files` /
    * Delta `OPTIMIZE` economics; the MergeTree analogue is background
    * part merging, README.md:547-548): after part-fold + vector-fold
    * + carry-by-reference, the table must replay the exact post-DML
    * state — hash-matched against a DuckDB replay of load +
    * clone-append − deletes (a row lost or duplicated by the fold, or
    * a resurrected vector-deleted row, is a count/hash mismatch). */
  def snapshotRewriteFiles: Q = (s, d) =>
    sqlMonthAgg(s, registerSnapCatalog(s, prepareSnapshotRewrite(s, d)))

  /** One CLEAN (no-DML) snapshot per (JVM, sfDir) for the
    * metadata-only aggregate lanes — the manifest stats must answer
    * alone, so the history is a single full load. */
  private val snapAggPrepared = scala.collection.mutable.Set[String]()
  private def prepareSnapshotAgg(s: SparkSession, d: String): String = {
    val root = graft.util.Fs.processScratchRoot("snapagg",
      s"_${d.hashCode.toHexString}")
    synchronized {
      if (!snapAggPrepared.contains(root)) {
        graft.util.Fs.deleteRecursively(new java.io.File(root))
        SnapshotStore.write(ordersWithMonth(s, d), root,
          partCol = "order_month", sortCol = "o_orderdate")
        snapAggPrepared += root
      }
    }
    root
  }

  private def requireMetadataOnly(df: DataFrame, lane: String): DataFrame = {
    // AQE wraps the plan in an AdaptiveSparkPlanExec with NO children —
    // collect on the wrapper alone would pass vacuously, so unwrap
    val phys = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive
          .AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    val scans = phys.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    require(scans.isEmpty,
      s"$lane: expected a metadata-only plan (manifest-stats aggregate), " +
        s"but the plan scans data files — the " +
        s"SnapshotMetadataOnlyAgg rewrite regressed:\n" +
        df.queryExecution.executedPlan)
    df
  }

  /** METADATA-ONLY AGGREGATES ([[graft.plans.SnapshotMetadataOnlyAgg]]):
    * whole-table COUNT(*)/MIN/MAX across long/double/date/string
    * columns answered purely from manifest stats — the lane REQUIRES
    * the executed plan to be scan-free (a silent fallback to the scan
    * would stay hash-green while losing the O(manifest) property this
    * lane exists to pin), then hash-matches the values against DuckDB
    * computing the same aggregates the hard way. */
  def snapshotAggStats: Q = (s, d) => {
    val t = registerSnapCatalog(s, prepareSnapshotAgg(s, d))
    requireMetadataOnly(s.sql(
      s"""SELECT count(*) AS cnt,
         | min(o_orderkey) AS mn_key, max(o_orderkey) AS mx_key,
         | min(o_totalprice) AS mn_price, max(o_totalprice) AS mx_price,
         | min(o_orderdate) AS mn_date, max(o_orderdate) AS mx_date,
         | min(o_orderpriority) AS mn_prio, max(o_orderpriority) AS mx_prio
         |FROM $t""".stripMargin), "snapshot_agg_stats")
  }

  /** `__part=` dir names the planned scan will actually read — AFTER
    * manifest-stats file skipping (the planned FilePartitions, not the
    * file index, which deliberately stays unpruned). */
  private def plannedPartDirs(df: DataFrame): Set[String] =
    df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2
          .DataSourceV2ScanRelation => r.scan
    }.collect {
      case f: org.apache.spark.sql.execution.datasources.v2.FileScan =>
        f.planInputPartitions().toSeq.collect {
          case fp: org.apache.spark.sql.execution.datasources
              .FilePartition => fp.files.toSeq
        }.flatten.map(_.filePath.toPath.getParent.getName)
    }.flatten.toSet

  /** MANIFEST-STATS FILE SKIPPING ([[graft.sources.GraftStatsPrune]]):
    * a time-range probe on the sort/stat column scans ONLY the month
    * dirs whose `[min,max]` overlap the range — the lane REQUIRES the
    * planned scan to have skipped every other month (a silent
    * regression to scan-everything would stay hash-green while losing
    * the file-skipping property), then hash-matches a DuckDB replay
    * of the same range aggregate. */
  def snapshotStatsPrune: Q = (s, d) => {
    val t = registerSnapCatalog(s, prepareSnapshotAgg(s, d))
    val df = s.sql(
      s"""SELECT order_month, count(*) AS cnt,
         | round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,8)))
         |   AS DOUBLE), 4) AS sum_price
         |FROM $t
         |WHERE o_orderdate >= TIMESTAMP'1997-06-15 00:00:00'
         |  AND o_orderdate < TIMESTAMP'1997-09-15 00:00:00'
         |GROUP BY order_month""".stripMargin)
    val dirs = plannedPartDirs(df)
    val allowed = Set("1997-06", "1997-07", "1997-08", "1997-09")
    require(dirs.nonEmpty && dirs.forall(dir => allowed.exists(dir.contains)),
      s"snapshot_stats_prune: expected the scan to skip every month " +
        s"outside $allowed via manifest stats, but it plans: $dirs")
    df
  }

  /** Planned FILE basenames after manifest-stats skipping — the
    * file-grain sibling of [[plannedPartDirs]]. */
  private def plannedFileNames(df: DataFrame): Set[String] =
    df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2
          .DataSourceV2ScanRelation => r.scan
    }.collect {
      case f: org.apache.spark.sql.execution.datasources.v2.FileScan =>
        f.planInputPartitions().toSeq.collect {
          case fp: org.apache.spark.sql.execution.datasources
              .FilePartition => fp.files.toSeq
        }.flatten.map(_.filePath.toPath.getName)
    }.flatten.toSet

  /** One BINPACKED snapshot per (JVM, sfDir) for the file-grain
    * skipping lane: full load, then a full
    * [[SnapshotStore.rewriteDataFiles]] pass whose target splits the
    * 1997-06 month into ≥3 contiguous sorted slices (per-file
    * sort-column stats recorded by the rewrite commit). */
  private val snapFpPrepared = scala.collection.mutable.Set[String]()
  private def prepareSnapshotFilePrune(s: SparkSession, d: String)
      : String = {
    val root = graft.util.Fs.processScratchRoot("snapfp",
      s"_${d.hashCode.toHexString}")
    synchronized {
      if (!snapFpPrepared.contains(root)) {
        graft.util.Fs.deleteRecursively(new java.io.File(root))
        SnapshotStore.write(ordersWithMonth(s, d), root,
          partCol = "order_month", sortCol = "o_orderdate")
        val m = SnapshotStore.current(root).get
        val june = m.entries.find(_.value == "1997-06").getOrElse(
          sys.error("snapshot_file_prune: testdata lacks 1997-06"))
        val juneBytes = listParquet(root, june.dir).map(_.length).sum
        SnapshotStore.rewriteDataFiles(s, root, onlyDirty = false,
          targetFileBytes = math.max(1L, juneBytes / 4))
        val m2 = SnapshotStore.current(root).get
        val june2 = m2.entries.filter(_.value == "1997-06")
        require(june2.size == 1 &&
            june2.head.stats.exists(_.files.size >= 3),
          "snapshot_file_prune: the binpack rewrite did not split " +
            "1997-06 into ≥3 slices — fixture assumption broken")
        snapFpPrepared += root
      }
    }
    root
  }

  private def listParquet(root: String, dir: String)
      : Seq[java.io.File] =
    Option(new java.io.File(s"$root/$dir").listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).toSeq

  /** FILE-GRAIN stats skipping ([[graft.etl.SnapshotStore.FileStats]]
    * + the scan's per-file prune): after a range binpack, a 7-day
    * probe inside one month must plan a STRICT SUBSET of that month's
    * slices — every other month drops at dir grain, every
    * non-overlapping slice at file grain. The lane REQUIRES both
    * grains (a regression to dir-only skipping stays hash-green while
    * losing the per-file economics), then hash-matches a DuckDB
    * replay of the range aggregate over raw orders. */
  def snapshotFilePrune: Q = (s, d) => {
    val root = prepareSnapshotFilePrune(s, d)
    val t = registerSnapCatalog(s, root)
    val df = s.sql(
      s"""SELECT order_month, count(*) AS cnt,
         | round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,8)))
         |   AS DOUBLE), 4) AS sum_price
         |FROM $t
         |WHERE o_orderdate >= TIMESTAMP'1997-06-08 00:00:00'
         |  AND o_orderdate < TIMESTAMP'1997-06-15 00:00:00'
         |GROUP BY order_month""".stripMargin)
    val planned = plannedFileNames(df)
    val m = SnapshotStore.current(root).get
    val juneFiles = m.entries.filter(_.value == "1997-06")
      .flatMap(e => listParquet(root, e.dir)).map(_.getName).toSet
    require(planned.nonEmpty && planned.subsetOf(juneFiles),
      s"snapshot_file_prune: months outside 1997-06 must drop at dir " +
        s"grain, but the scan plans: ${planned -- juneFiles}")
    require(planned.size < juneFiles.size,
      s"snapshot_file_prune: expected the 7-day probe to skip " +
        s"non-overlapping slices of 1997-06, but it plans all " +
        s"${juneFiles.size} files")
    df
  }

  /** PARTITION-GRAIN metadata rollup: GROUP BY the identity partition
    * column answers per-month COUNT/MIN/MAX purely from entry stats
    * (zero scans — the single most common operational rollup at
    * 100 TB: "how big is each month"). Hash-matched against DuckDB
    * recomputing the same rollup from raw orders. */
  def snapshotAggGroup: Q = (s, d) => {
    val t = registerSnapCatalog(s, prepareSnapshotAgg(s, d))
    requireMetadataOnly(s.sql(
      s"""SELECT order_month, count(*) AS cnt,
         | min(o_totalprice) AS mn_price, max(o_orderkey) AS mx_key
         |FROM $t GROUP BY order_month""".stripMargin),
      "snapshot_agg_group")
  }

  /** FILTERED metadata aggregates: a WHERE clause every entry decides
    * uniformly (here: a month range on the identity partition column)
    * answers COUNT/MIN/MAX from the selected entries' stats alone —
    * the lane REQUIRES a scan-free plan and hash-matches DuckDB
    * computing the same filtered aggregates over raw orders. */
  def snapshotAggFiltered: Q = (s, d) => {
    val t = registerSnapCatalog(s, prepareSnapshotAgg(s, d))
    requireMetadataOnly(s.sql(
      s"""SELECT count(*) AS cnt, min(o_orderdate) AS mn_date,
         | max(o_totalprice) AS mx_price
         |FROM $t
         |WHERE order_month >= '1997-01' AND order_month < '1998-01'
         |""".stripMargin), "snapshot_agg_filtered")
  }

  /** METADATA INSPECTION TABLES ([[graft.sources.GraftMetaTables]]):
    * `table$partitions` reports per-value LIVE rows straight from the
    * manifest (a LocalScan — no data read); the oracle recomputes the
    * same per-month counts from raw orders, so a drifted live-row
    * account (stats, DV arithmetic, entry grouping) hash-mismatches. */
  def snapshotMetaPartitions: Q = (s, d) => {
    val root = prepareSnapshotAgg(s, d)
    registerSnapCatalog(s, root)
    val n = new java.io.File(root).getName
    s.sql(s"SELECT value AS order_month, live_rows AS cnt " +
      s"FROM graftsnap.`$n$$partitions`")
  }

  /** `table$files` over the MERGE-ON-READ history: per-entry live rows
    * must sum per month to the post-DML counts — the additive UPDATE
    * parts count in, the DV'd positions count out. A DV accounting
    * error anywhere (vector rows, stats rows, entry grouping) breaks
    * the hash against the raw-orders replay. */
  def snapshotMetaFiles: Q = (s, d) => {
    val root = prepareSnapshotDv(s, d)
    registerSnapCatalog(s, root)
    val n = new java.io.File(root).getName
    s.sql(s"SELECT value AS order_month, " +
      s"CAST(sum(live_rows) AS BIGINT) AS cnt " +
      s"FROM graftsnap.`$n$$files` GROUP BY value")
  }

  /** COUNT(*) on a DELETION-VECTOR-bearing table stays metadata-only
    * AND exact: live rows = stats rows − vector positions, no scan.
    * (Delta's metadata-only count gives up in the presence of DVs
    * unless the DV row counts are trusted; here they are part of the
    * manifest contract.) Reuses the DV history, so the count must
    * reflect the merge-on-read DELETE exactly. */
  def snapshotAggDvCount: Q = (s, d) => {
    val t = registerSnapCatalog(s, prepareSnapshotDv(s, d))
    requireMetadataOnly(
      s.sql(s"SELECT count(*) AS cnt FROM $t"), "snapshot_agg_dv_count")
  }

  /** One MULTIPART-layout history per (JVM, sfDir): orders committed
    * under a TWO-identity-column partition spec
    * (`order_month,o_orderpriority` — [[graft.etl.PartitionSpec]], the
    * multi-tenant grain a 100 TB corpus needs), then the full DML
    * surface over it:
    *   1. DELETE constrained on BOTH partition columns — a
    *      metadata-only partition drop pruned on the composite token;
    *   2. DELETE with an OR ACROSS the two columns — still
    *      partition-granular (the token evaluator decides per entry);
    *   3. row-level UPDATE (keys ≡1 mod 10 from 1998 on, +2.50) —
    *      copy-on-write restatement of touched composite partitions;
    *   4. native MERGE INTO (keys ≡2 mod 10 of '1998-02', +11.25;
    *      disjoint key class, so replay order is immaterial). */
  private val snapMultipartPrepared = scala.collection.mutable.Set[String]()
  private def prepareSnapshotMultipart(s: SparkSession, d: String)
      : String = {
    val root = graft.util.Fs.processScratchRoot("snapmpart",
      s"_${d.hashCode.toHexString}")
    synchronized {
      if (!snapMultipartPrepared.contains(root)) {
        graft.util.Fs.deleteRecursively(new java.io.File(root))
        SnapshotStore.write(ordersWithMonth(s, d), root,
          partCol = "order_month,o_orderpriority",
          sortCol = "o_orderdate")
        val table = registerSnapCatalog(s, root)
        s.sql(s"DELETE FROM $table WHERE order_month = '1998-05' " +
          "AND o_orderpriority = '1-URGENT'")
        s.sql(s"DELETE FROM $table WHERE order_month = '1998-03' " +
          "OR o_orderpriority = '3-MEDIUM'")
        s.sql(s"UPDATE $table SET o_totalprice = o_totalprice + 2.50 " +
          "WHERE o_orderkey % 10 = 1 AND o_orderdate >= DATE '1998-01-01'")
        ordersWithMonth(s, d)
          .filter(col("o_orderkey") % 10 === 2 &&
            col("order_month") === "1998-02")
          .select(col("o_orderkey").as("k"),
            (col("o_totalprice") + 11.25).as("newprice"))
          .createOrReplaceTempView("snap_mpart_changes")
        s.sql(
          s"""MERGE INTO $table AS t USING snap_mpart_changes AS s
             |ON t.o_orderkey = s.k
             |WHEN MATCHED THEN UPDATE SET o_totalprice = s.newprice
             |""".stripMargin)
        snapMultipartPrepared += root
      }
    }
    root
  }

  /** Multi-column partition spec, end to end: partition-granular
    * DELETEs pruning on both token components, row-level UPDATE and
    * MERGE over the composite layout — hash-matched against a DuckDB
    * replay of all four mutations over raw orders. */
  def snapshotMultipart: Q = (s, d) =>
    sqlMonthAgg(s, registerSnapCatalog(s, prepareSnapshotMultipart(s, d)))

  /** One BUCKET-layout history per (JVM, sfDir): orders committed
    * under `(order_month, bucket(8, o_orderkey))` — the hash-bucketed
    * composite grain ([[graft.etl.PartitionSpec]]) — then row-level
    * DML that must stay ROW-exact across lossy bucket partitions
    * (deleting key residue 7 must not touch residue-15 keys sharing
    * buckets; the update's discovery and landing hash through the
    * spec's own expression):
    *   1. row-level DELETE, keys ≡7 (mod 10);
    *   2. row-level UPDATE (+3.75 on keys ≡8 mod 10 from Feb 1998). */
  private val snapBucketPrepared = scala.collection.mutable.Set[String]()
  private def prepareSnapshotBucket(s: SparkSession, d: String)
      : String = {
    val root = graft.util.Fs.processScratchRoot("snapbucket",
      s"_${d.hashCode.toHexString}")
    synchronized {
      if (!snapBucketPrepared.contains(root)) {
        graft.util.Fs.deleteRecursively(new java.io.File(root))
        SnapshotStore.write(ordersWithMonth(s, d), root,
          partCol = "order_month,bucket(8,o_orderkey)",
          sortCol = "o_orderdate")
        val table = registerSnapCatalog(s, root)
        s.sql(s"DELETE FROM $table WHERE o_orderkey % 10 = 7")
        s.sql(s"UPDATE $table SET o_totalprice = o_totalprice + 3.75 " +
          "WHERE o_orderkey % 10 = 8 " +
          "AND o_orderdate >= DATE '1998-02-01'")
        snapBucketPrepared += root
      }
    }
    root
  }

  /** Hash-bucketed composite layout, end to end: row-level DELETE and
    * UPDATE over `(month, bucket(8, key))` partitions — hash-matched
    * against a DuckDB replay over raw orders (one wrongly-drained
    * bucket mismatches immediately). */
  def snapshotBucket: Q = (s, d) =>
    sqlMonthAgg(s, registerSnapCatalog(s, prepareSnapshotBucket(s, d)))

  /** One RENAMED history per (JVM, sfDir): full load, then two
    * column-ID renames (`o_totalprice` → `total_price` and the
    * PARTITION column `order_month` → `month` — metadata-only commits,
    * [[SnapshotStore.renameColumns]]; files keep their physical
    * spelling), then writes and DML through the NEW names:
    *   1. `INSERT … SELECT` clones keys ≡3 (mod 50) (+3e9 key, +1.25)
    *      — post-rename files land under the INVARIANT physical names
    *      and one scan mixes both eras;
    *   2. row-level UPDATE (+7.50 on keys ≡4 mod 10 of '1998-04',
    *      addressed via the renamed partition column — stats keys were
    *      re-keyed by the rename, so pruning still applies). */
  private val snapRenamePrepared = scala.collection.mutable.Set[String]()
  private def prepareSnapshotSqlRename(s: SparkSession, d: String)
      : String = {
    val root = graft.util.Fs.processScratchRoot("snaprename",
      s"_${d.hashCode.toHexString}")
    synchronized {
      if (!snapRenamePrepared.contains(root)) {
        graft.util.Fs.deleteRecursively(new java.io.File(root))
        SnapshotStore.write(ordersWithMonth(s, d), root,
          partCol = "order_month", sortCol = "o_orderdate")
        val table = registerSnapCatalog(s, root)
        s.sql(s"ALTER TABLE $table RENAME COLUMN o_totalprice " +
          "TO total_price")
        s.sql(s"ALTER TABLE $table RENAME COLUMN order_month TO month")
        s.sql(s"INSERT INTO $table SELECT o_orderkey + 3000000000, " +
          "o_custkey, o_orderstatus, total_price + 1.25, o_orderdate, " +
          s"o_orderpriority, month FROM $table WHERE o_orderkey % 50 = 3")
        s.sql(s"UPDATE $table SET total_price = total_price + 7.50 " +
          "WHERE o_orderkey % 10 = 4 AND month = '1998-04'")
        snapRenamePrepared += root
      }
    }
    root
  }

  /** Column-ID RENAME end to end: pre- and post-rename files in one
    * scan, DML through the new names — hash-matched against a DuckDB
    * replay over raw orders. */
  def snapshotSqlRename: Q = (s, d) => {
    val table = registerSnapCatalog(s, prepareSnapshotSqlRename(s, d))
    s.sql(s"""SELECT month, count(*) AS cnt,
             | round(CAST(sum(CAST(total_price AS DECIMAL(38,8)))
             |   AS DOUBLE), 4) AS sum_price
             |FROM $table GROUP BY month""".stripMargin)
  }

  /** One DROP+re-ADD history per (JVM, sfDir): full load, metadata-only
    * `ALTER TABLE DROP COLUMN o_orderpriority`
    * ([[SnapshotStore.dropColumns]] — dirs carry by reference, the
    * files keep the physical column), then `ADD COLUMN` of the SAME
    * name (fresh field id + suffixed physical spelling from the
    * retired registry) and an INSERT of clone rows carrying a priority
    * value. The lane aggregates BY the re-added column: every pre-drop
    * row must read NULL — a zombie resurrection (the retained files'
    * old priority values leaking into the re-added column) lands rows
    * in the wrong groups and hash-mismatches. */
  private val snapDropPrepared = scala.collection.mutable.Set[String]()
  private def prepareSnapshotSqlDrop(s: SparkSession, d: String)
      : String = {
    val root = graft.util.Fs.processScratchRoot("snapdrop",
      s"_${d.hashCode.toHexString}")
    synchronized {
      if (!snapDropPrepared.contains(root)) {
        graft.util.Fs.deleteRecursively(new java.io.File(root))
        SnapshotStore.write(ordersWithMonth(s, d), root,
          partCol = "order_month", sortCol = "o_orderdate")
        val table = registerSnapCatalog(s, root)
        s.sql(s"ALTER TABLE $table DROP COLUMN o_orderpriority")
        s.sql(s"ALTER TABLE $table ADD COLUMN o_orderpriority STRING")
        // re-added column is LAST in the schema now; clones carry a
        // sentinel priority no original row ever had
        s.sql(s"INSERT INTO $table SELECT o_orderkey + 4000000000, " +
          "o_custkey, o_orderstatus, o_totalprice + 0.75, o_orderdate, " +
          s"order_month, 'READDED' FROM $table " +
          "WHERE o_orderkey % 25 = 3 AND o_orderkey < 4000000000")
        snapDropPrepared += root
      }
    }
    root
  }

  /** One spec-EVOLVED history per (JVM, sfDir): full load under the
    * single-identity `order_month` layout, then
    * `CALL system.evolve_spec` to `order_month,bucket(4,o_orderkey)`
    * (metadata-only — every existing entry records the outgoing spec
    * and carries by reference), then DML SPANNING BOTH VINTAGES:
    * an INSERT of clone rows (lands under the new composite-token
    * layout), a row-level UPDATE (discovers old entries by THEIR
    * month tokens and new entries by composite tokens, and migrates
    * the old months it touches), and a row-level DELETE. The month
    * aggregate must replay over raw orders — a vintage silently
    * missed by discovery, or a migration losing/duplicating rows,
    * is a hash mismatch. */
  private val snapEvolvePrepared = scala.collection.mutable.Set[String]()
  private def prepareSnapshotSpecEvolve(s: SparkSession, d: String)
      : String = {
    val root = graft.util.Fs.processScratchRoot("snapevolve",
      s"_${d.hashCode.toHexString}")
    synchronized {
      if (!snapEvolvePrepared.contains(root)) {
        graft.util.Fs.deleteRecursively(new java.io.File(root))
        SnapshotStore.write(ordersWithMonth(s, d), root,
          partCol = "order_month", sortCol = "o_orderdate")
        val table = registerSnapCatalog(s, root)
        val name = new java.io.File(root).getName
        s.sql(s"CALL graftsnap.system.evolve_spec('$name', " +
          "'order_month,bucket(4,o_orderkey)')")
        // INSERT lands under the NEW spec (clone keys keep the mod-10
        // residue: +5e9 ≡ 0 mod 10)
        s.sql(s"INSERT INTO $table SELECT o_orderkey + 5000000000, " +
          "o_custkey, o_orderstatus, o_totalprice + 2.0, o_orderdate, " +
          s"o_orderpriority, order_month FROM $table " +
          "WHERE o_orderkey % 50 = 9 AND o_orderkey < 5000000000")
        // UPDATE spans vintages: ≡9 (mod 10) originals live in OLD
        // month entries, their clones in NEW bucketed entries
        s.sql(s"UPDATE $table SET o_totalprice = o_totalprice + 3.25 " +
          "WHERE o_orderkey % 10 = 9 AND o_orderdate >= DATE '1998-02-01'")
        // DELETE hits the old vintage only (clones are ≡9 mod 10)
        s.sql(s"DELETE FROM $table WHERE o_orderkey % 10 = 7 " +
          "AND o_orderdate >= DATE '1998-03-01'")
        // native MERGE WITHOUT a prior compact (r14: MERGE discovery
        // is file-attributed, vintage-uniform): matched keys ≡5
        // (mod 20) live in BOTH old month entries and — via earlier
        // migrations — current-spec entries; +1.50 each. A vintage
        // silently missed by MERGE discovery is a hash mismatch.
        ordersWithMonth(s, d)
          .filter(col("o_orderkey") % 20 === 5)
          .select(col("o_orderkey").as("k"),
            (col("o_totalprice") + 1.50).as("newprice"))
          .createOrReplaceTempView("snap_evolve_changes")
        s.sql(
          s"""MERGE INTO $table AS t USING snap_evolve_changes AS s
             |ON t.o_orderkey = s.k
             |WHEN MATCHED THEN UPDATE SET o_totalprice = s.newprice
             |""".stripMargin)
        snapEvolvePrepared += root
      }
    }
    root
  }

  /** One cross-vintage OVERWRITE history per (JVM, sfDir): full load
    * under `bucket(8,o_orderkey)` (every bucket mixes months), evolve
    * to the `order_month` identity layout (metadata-only), then the
    * standard corrected-month dynamic backfill
    * ([[SnapshotStore.overwritePartitions]]). The addressed month's
    * rows live INSIDE old-vintage bucket entries — the overwrite must
    * reach them, drop them, and migrate each affected bucket's other
    * months to the current layout exactly once. Final state ==
    * [[backfillOverwrite]]'s, so the lane shares its oracle. */
  private val snapEvolveOwPrepared = scala.collection.mutable.Set[String]()
  private def prepareSnapshotEvolveOverwrite(s: SparkSession, d: String)
      : String = {
    val root = graft.util.Fs.processScratchRoot("snapevow",
      s"_${d.hashCode.toHexString}")
    synchronized {
      if (!snapEvolveOwPrepared.contains(root)) {
        graft.util.Fs.deleteRecursively(new java.io.File(root))
        val orders = ordersWithMonth(s, d)
        SnapshotStore.write(orders, root,
          partCol = "bucket(8,o_orderkey)", sortCol = "o_orderdate")
        SnapshotStore.evolvePartitionSpec(root, "order_month")
        SnapshotStore.overwritePartitions(correctedLastMonth(orders),
          root, partCol = "order_month", sortCol = "o_orderdate")
        snapEvolveOwPrepared += root
      }
    }
    root
  }

  /** Dynamic overwrite ACROSS spec vintages, end to end — the
    * corrected-month restatement on a table whose history is still
    * bucket-partitioned. One row leaked from (or duplicated by) the
    * survivor migration is a hash mismatch. */
  def snapshotEvolveOverwrite: Q = (s, d) =>
    monthAgg(SnapshotStore.read(s,
      prepareSnapshotEvolveOverwrite(s, d)))

  /** One WRITE-AUDIT-PUBLISH history per (JVM, sfDir): full load, cut
    * branch `audit`, stage a BAD commit (negative-price clones), fail
    * the audit, RESET the branch, stage the GOOD commit (keys ≡21
    * (mod 50) cloned, +0.50 price, +8e9 key), pass the audit,
    * FAST-FORWARD. The prepare ASSERTS main never saw the staged
    * states (count pinned at the original between fork and publish) —
    * the isolation property the lane exists to pin; the final
    * aggregate hash-matches a replay of load + good clones only (one
    * leaked bad row is a mismatch). */
  private val snapWapPrepared = scala.collection.mutable.Set[String]()
  private def prepareSnapshotBranchWap(s: SparkSession, d: String)
      : String = {
    val root = graft.util.Fs.processScratchRoot("snapwap",
      s"_${d.hashCode.toHexString}")
    synchronized {
      if (!snapWapPrepared.contains(root)) {
        graft.util.Fs.deleteRecursively(new java.io.File(root))
        val orders = ordersWithMonth(s, d)
        val baseCount = orders.count()
        SnapshotStore.write(orders, root,
          partCol = "order_month", sortCol = "o_orderdate")
        val fork = SnapshotStore.branch(root, "audit")
        def clones(mod: Int, bump: Double) = orders
          .filter(col("o_orderkey") % 50 === mod)
          .withColumn("o_orderkey", col("o_orderkey") + 8000000000L)
          .withColumn("o_totalprice", col("o_totalprice") + bump)
        // WRITE (bad): a poisoned batch the audit must catch
        SnapshotStore.appendToBranch(
          clones(21, 0.0).withColumn("o_totalprice", lit(-1000000.0)),
          root, "audit")
        require(SnapshotStore.read(s, root).count() == baseCount,
          "WAP isolation broken: main saw a staged (bad) commit")
        require(SnapshotStore.readBranch(s, root, "audit")
          .filter(col("o_totalprice") < 0).count() > 0,
          "the audit read must see the staged bad rows")
        SnapshotStore.resetBranch(root, "audit", toId = fork.id)
        // WRITE (good) → AUDIT green → PUBLISH
        SnapshotStore.appendToBranch(clones(21, 0.50), root, "audit")
        require(SnapshotStore.readBranch(s, root, "audit")
          .filter(col("o_totalprice") < 0).count() == 0, "audit failed")
        require(SnapshotStore.read(s, root).count() == baseCount,
          "WAP isolation broken: main saw a staged (good) commit")
        SnapshotStore.fastForward(root, "audit")
        snapWapPrepared += root
      }
    }
    root
  }

  /** Write-audit-publish end to end: main carries exactly load + the
    * validated clones after the fast-forward. */
  def snapshotBranchWap: Q = (s, d) =>
    sqlMonthAgg(s, registerSnapCatalog(s, prepareSnapshotBranchWap(s, d)))

  /** One NESTED-evolution history per (JVM, sfDir): orders loaded with
    * a STRUCT column `meta(pri, price)`, then
    * `ALTER TABLE RENAME COLUMN meta.pri TO priority` (metadata-only —
    * files keep the physical subfield spelling, reads rebuild the
    * struct), `ADD COLUMN meta.src STRING` (old files read it as
    * null), and an INSERT of clone rows (keys ≡31 mod 50, +9e9 key,
    * +0.25 price, src='NEW') whose files spell the FROZEN physical
    * name under the evolved shape. The lane groups BY the renamed
    * subfield across both file eras — a rename that strands either
    * era reads NULL priorities and hash-mismatches. */
  private val snapNestedPrepared = scala.collection.mutable.Set[String]()
  private def prepareSnapshotNested(s: SparkSession, d: String): String = {
    val root = graft.util.Fs.processScratchRoot("snapnested",
      s"_${d.hashCode.toHexString}")
    synchronized {
      if (!snapNestedPrepared.contains(root)) {
        graft.util.Fs.deleteRecursively(new java.io.File(root))
        SnapshotStore.write(
          ordersWithMonth(s, d).select(col("o_orderkey"),
            col("order_month"),
            struct(col("o_orderpriority").as("pri"),
              col("o_totalprice").as("price")).as("meta")),
          root, partCol = "order_month", sortCol = "o_orderkey")
        val table = registerSnapCatalog(s, root)
        s.sql(s"ALTER TABLE $table RENAME COLUMN meta.pri TO priority")
        s.sql(s"ALTER TABLE $table ADD COLUMN meta.src STRING")
        s.sql(s"INSERT INTO $table SELECT o_orderkey + 9000000000, " +
          "order_month, named_struct('priority', meta.priority, " +
          s"'price', meta.price + 0.25, 'src', 'NEW') FROM $table " +
          "WHERE o_orderkey % 50 = 31 AND o_orderkey < 9000000000")
        snapNestedPrepared += root
      }
    }
    root
  }

  /** Nested-type schema evolution end to end: pre-rename files (old
    * physical spelling, no src), post-evolution files (frozen physical
    * spelling + src) — one scan groups by the renamed subfield and the
    * null-filled added one. */
  def snapshotNestedEvolve: Q = (s, d) => {
    val table = registerSnapCatalog(s, prepareSnapshotNested(s, d))
    s.sql(s"""SELECT meta.priority AS pri,
             | coalesce(meta.src, 'old') AS src, count(*) AS cnt,
             | round(CAST(sum(CAST(meta.price AS DECIMAL(38,8)))
             |   AS DOUBLE), 4) AS sum_price
             |FROM $table GROUP BY 1, 2""".stripMargin)
  }

  /** One type-WIDENED history per (JVM, sfDir): full load with
    * o_custkey narrowed to INT (it fits at every sf), then
    * `ALTER COLUMN o_custkey TYPE BIGINT`
    * ([[SnapshotStore.widenColumnTypes]] — metadata-only, old int32
    * files up-cast at scan time), then an INSERT of clone rows whose
    * custkeys NEED the wide type (+5e9, above Int.MaxValue). The lane
    * aggregates sum(o_custkey) per month over both file vintages — a
    * failed promotion either crashes the scan or mangles the sum. */
  private val snapWidenPrepared = scala.collection.mutable.Set[String]()
  private def prepareSnapshotSqlWiden(s: SparkSession, d: String)
      : String = {
    val root = graft.util.Fs.processScratchRoot("snapwiden",
      s"_${d.hashCode.toHexString}")
    synchronized {
      if (!snapWidenPrepared.contains(root)) {
        graft.util.Fs.deleteRecursively(new java.io.File(root))
        SnapshotStore.write(
          ordersWithMonth(s, d)
            .withColumn("o_custkey", col("o_custkey").cast("int")),
          root, partCol = "order_month", sortCol = "o_orderdate")
        val table = registerSnapCatalog(s, root)
        s.sql(s"ALTER TABLE $table ALTER COLUMN o_custkey TYPE BIGINT")
        s.sql(s"INSERT INTO $table SELECT o_orderkey + 6000000000, " +
          "o_custkey + 5000000000, o_orderstatus, o_totalprice, " +
          s"o_orderdate, o_orderpriority, order_month FROM $table " +
          "WHERE o_orderkey % 40 = 11 AND o_orderkey < 6000000000")
        snapWidenPrepared += root
      }
    }
    root
  }

  /** Type widening end to end: int32 and int64 file vintages in one
    * scan, summed into a value only the wide type can hold. */
  def snapshotSqlWiden: Q = (s, d) => {
    val table = registerSnapCatalog(s, prepareSnapshotSqlWiden(s, d))
    s.sql(s"""SELECT order_month, count(*) AS cnt,
             | CAST(sum(o_custkey) AS BIGINT) AS sum_cust
             |FROM $table GROUP BY order_month""".stripMargin)
  }

  /** Partition-spec evolution end to end: both vintages in one scan,
    * DML across them — hash-matched against a DuckDB replay. */
  def snapshotSpecEvolve: Q = (s, d) =>
    sqlMonthAgg(s, registerSnapCatalog(s, prepareSnapshotSpecEvolve(s, d)))

  /** Two co-bucketed snapshot tables per (JVM, sfDir) for the
    * STORAGE-PARTITIONED JOIN: both written under `bucket(16,
    * o_orderkey)`, so their scans report the same
    * `KeyGroupedPartitioning` and the fact-to-fact equi-join plans
    * with ZERO exchanges under the V2-bucketing session (the
    * Iceberg-style SPJ — at 100 TB this deletes the dominant shuffle
    * of every co-layout join). PlanAudit asserts the exchange-free
    * join subtree; this lane pins the RESULT against a DuckDB join
    * replay (a bucket mis-grouping — two co-bucketed keys meeting in
    * different tasks — drops join rows and mismatches). */
  private val snapSpjPrepared = scala.collection.mutable.Set[String]()
  private def prepareSnapshotSpj(s: SparkSession, d: String): String = {
    val root = graft.util.Fs.processScratchRoot("snapspj",
      s"_${d.hashCode.toHexString}")
    synchronized {
      if (!snapSpjPrepared.contains(root)) {
        graft.util.Fs.deleteRecursively(new java.io.File(root))
        val o = ordersWithMonth(s, d)
        SnapshotStore.write(o, s"$root/a",
          partCol = "bucket(16,o_orderkey)", sortCol = "o_orderdate")
        SnapshotStore.write(
          o.select(col("o_orderkey"),
            when(col("o_orderpriority") === "1-URGENT", 10.0)
              .otherwise(1.0).as("adj")),
          s"$root/b",
          partCol = "bucket(16,o_orderkey)", sortCol = "o_orderkey")
        snapSpjPrepared += root
      }
    }
    root
  }

  /** Two co-laid-out `months(o_orderdate)` snapshot tables per (JVM,
    * sfDir) — the STORAGE-PARTITIONED JOIN for TIME-transform specs
    * (r14; the reference's own MergeTree month layout, README.md:548,
    * made exchange-free): both scans report `months(date)`
    * KeyGroupedPartitioning via the graft V2 time functions, and the
    * date-keyed equi-join plans with ZERO exchanges under the
    * V2-bucketing session. The lane pins the RESULT against a DuckDB
    * join replay; PlanAudit asserts the exchange-free subtree. */
  private val snapSpjTimePrepared = scala.collection.mutable.Set[String]()
  private def prepareSnapshotSpjTime(s: SparkSession, d: String): String = {
    val root = graft.util.Fs.processScratchRoot("snapspjt",
      s"_${d.hashCode.toHexString}")
    synchronized {
      if (!snapSpjTimePrepared.contains(root)) {
        graft.util.Fs.deleteRecursively(new java.io.File(root))
        val o = ordersWithMonth(s, d)
        SnapshotStore.write(o, s"$root/a",
          partCol = "months(o_orderdate)", sortCol = "o_orderdate")
        SnapshotStore.write(
          o.select(col("o_orderdate")).distinct()
            .withColumn("adj",
              (dayofmonth(col("o_orderdate")) * 0.01).cast("double")),
          s"$root/b",
          partCol = "months(o_orderdate)", sortCol = "o_orderdate")
        snapSpjTimePrepared += root
      }
    }
    root
  }

  /** Time-transform storage-partitioned join: per-date adjustments
    * joined back by date, month aggregate, exchange-free join. */
  def snapshotSpjTime: Q = (s, d) => {
    val root = prepareSnapshotSpjTime(s, d)
    val clone = org.apache.spark.sql.GraftPlanBridge.sessionWithConf(s,
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    clone.conf.set("spark.sql.catalog.graftspjt",
      classOf[graft.sources.GraftSnapshotCatalog].getName)
    clone.conf.set("spark.sql.catalog.graftspjt.warehouse", root)
    clone.sql(
      """SELECT a.order_month, count(*) AS cnt,
        | round(CAST(sum(CAST(a.o_totalprice + b.adj AS DECIMAL(38,8)))
        |   AS DOUBLE), 4) AS sum_price
        |FROM graftspjt.a a JOIN graftspjt.b b
        |  ON a.o_orderdate = b.o_orderdate
        |GROUP BY a.order_month""".stripMargin)
  }

  /** Storage-partitioned join over the co-bucketed pair: month
    * aggregate of the joined frame, exchange-free join subtree. */
  def snapshotSpj: Q = (s, d) => {
    val root = prepareSnapshotSpj(s, d)
    // scoped to a session CLONE: V2 bucketing + no-broadcast (the
    // join must be a sort-merge for SPJ to mean anything at sf0.01)
    val clone = org.apache.spark.sql.GraftPlanBridge.sessionWithConf(s,
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    clone.conf.set("spark.sql.catalog.graftspj",
      classOf[graft.sources.GraftSnapshotCatalog].getName)
    clone.conf.set("spark.sql.catalog.graftspj.warehouse", root)
    clone.sql(
      """SELECT a.order_month, count(*) AS cnt,
        | round(CAST(sum(CAST(a.o_totalprice + b.adj AS DECIMAL(38,8)))
        |   AS DOUBLE), 4) AS sum_price
        |FROM graftspj.a a JOIN graftspj.b b
        |  ON a.o_orderkey = b.o_orderkey
        |GROUP BY a.order_month""".stripMargin)
  }

  /** Column-ID DROP COLUMN end to end: pre-drop files + the re-added
    * fresh column in one scan — pre-drop rows group under NULL
    * priority, clones under the sentinel. */
  def snapshotSqlDrop: Q = (s, d) => {
    val table = registerSnapCatalog(s, prepareSnapshotSqlDrop(s, d))
    s.sql(s"""SELECT order_month,
             | coalesce(o_orderpriority, 'none') AS pri,
             | count(*) AS cnt,
             | round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,8)))
             |   AS DOUBLE), 4) AS sum_price
             |FROM $table GROUP BY order_month, o_orderpriority"""
      .stripMargin)
  }

  /** One DML-mutated history per (JVM, sfDir) for the ROW-EXACT change
    * feed: full load (seq 1), a native SQL UPDATE (keys ≡ 4 mod 10,
    * +7.50 — seq 2), a native row-level SQL DELETE (keys ≡ 6 mod 10 —
    * seq 3; disjoint key classes, so the delete sees original prices).
    * Both DML commits persist their changesets as CDC sidecars. */
  private val snapCdfRowPrepared = scala.collection.mutable.Set[String]()
  private def prepareSnapshotCdfRowlevel(s: SparkSession, d: String)
      : String = {
    val root = graft.util.Fs.processScratchRoot("snapcdfrl",
      s"_${d.hashCode.toHexString}")
    synchronized {
      if (!snapCdfRowPrepared.contains(root)) {
        graft.util.Fs.deleteRecursively(new java.io.File(root))
        SnapshotStore.write(ordersWithMonth(s, d), root,
          partCol = "order_month", sortCol = "o_orderdate")
        val table = registerSnapCatalog(s, root)
        s.sql(s"UPDATE $table SET o_totalprice = o_totalprice + 7.50 " +
          "WHERE o_orderkey % 10 = 4 AND o_orderdate >= DATE '1998-03-01'")
        s.sql(s"DELETE FROM $table WHERE o_orderkey % 10 = 6 " +
          "AND o_orderdate >= DATE '1998-03-01'")
        snapCdfRowPrepared += root
      }
    }
    root
  }

  /** ROW-EXACT CDC over DML commits ([[SnapshotStore.changeFeed]]'s
    * per-commit sidecar replay): the feed over (1, 3] must emit
    * EXACTLY the changed rows — `update_preimage` (old values) +
    * `update_postimage` (+7.50) for every updated key and `delete`
    * for every deleted one — never the wholesale restated partitions
    * (which hold every other row of the touched months too). The
    * DuckDB oracle replays the three changesets from raw orders, so
    * one extra emitted row is a hash mismatch. */
  def snapshotCdfRowlevel: Q = (s, d) => {
    val root = prepareSnapshotCdfRowlevel(s, d)
    SnapshotStore.changeFeed(s, root, fromSeq = 1L, toSeq = 3L)
      .groupBy(col("_change_type").as("change_type"),
        col("order_month"))
      .agg(count(lit(1)).as("cnt"),
        round(sum(col("o_totalprice").cast("decimal(38,8)"))
          .cast("double"), 4).as("sum_price"))
  }

  /** One rolled-back history per (JVM, sfDir): full load (seq 1), a
    * "bad" batch of mutations — an UPDATE inflating prices and a
    * DELETE removing a key band (seqs 2-3) — then
    * `CALL system.rollback(t, 1)` restores seq 1 as a NEW head
    * ([[SnapshotStore.rollback]]): the read must hash-equal the plain
    * orders aggregate, proving the restore is bit-exact, while the
    * rolled-back commits stay time-travel-visible until expire. */
  private val snapRollbackPrepared = scala.collection.mutable.Set[String]()
  private def prepareSnapshotRollback(s: SparkSession, d: String)
      : String = {
    val root = graft.util.Fs.processScratchRoot("snaprollb",
      s"_${d.hashCode.toHexString}")
    synchronized {
      if (!snapRollbackPrepared.contains(root)) {
        graft.util.Fs.deleteRecursively(new java.io.File(root))
        SnapshotStore.write(ordersWithMonth(s, d), root,
          partCol = "order_month", sortCol = "o_orderdate")
        val table = registerSnapCatalog(s, root)
        s.sql(s"UPDATE $table SET o_totalprice = o_totalprice * 100.0 " +
          "WHERE o_orderdate >= DATE '1998-03-01'")
        s.sql(s"DELETE FROM $table WHERE o_orderkey % 3 = 0 " +
          "AND o_orderdate >= DATE '1998-03-01'")
        val name = new java.io.File(root).getName
        s.sql(s"CALL graftsnap.system.rollback('$name', 1)")
        snapRollbackPrepared += root
      }
    }
    root
  }

  /** SQL rollback path: the restored head must read as the ORIGINAL
    * load, bit-exact (plain orders oracle). */
  def snapshotRollback: Q = (s, d) =>
    sqlMonthAgg(s, registerSnapCatalog(s, prepareSnapshotRollback(s, d)))

  /** One CTAS-created table per (JVM, sfDir): the FULL SQL lifecycle —
    * `CREATE TABLE … PARTITIONED BY (order_month) TBLPROPERTIES
    * ('sort_col'='o_orderdate') AS SELECT …` creates the empty
    * layout-recording manifest and appends the SELECT through the
    * locked commit in one statement ([[GraftSnapshotCatalog
    * .createTable]]); the read must hash-equal the plain orders
    * aggregate. */
  private val snapCtasPrepared = scala.collection.mutable.Set[String]()
  private def prepareSnapshotCtas(s: SparkSession, d: String): String = {
    val root = graft.util.Fs.processScratchRoot("snapctas",
      s"_${d.hashCode.toHexString}")
    synchronized {
      if (!snapCtasPrepared.contains(root)) {
        graft.util.Fs.deleteRecursively(new java.io.File(root))
        val table = registerSnapCatalog(s, root)
        s.sql(
          s"""CREATE TABLE $table
             |PARTITIONED BY (order_month)
             |TBLPROPERTIES ('sort_col' = 'o_orderdate')
             |AS SELECT *, date_format(o_orderdate, 'yyyy-MM')
             |     AS order_month
             |FROM parquet.`$d/orders.parquet`""".stripMargin)
        snapCtasPrepared += root
      }
    }
    root
  }

  /** Pure-SQL CREATE TABLE AS SELECT: lifecycle + load in one
    * statement, plain orders oracle. */
  def snapshotSqlCtas: Q = (s, d) =>
    sqlMonthAgg(s, registerSnapCatalog(s, prepareSnapshotCtas(s, d)))

  /** One tagged-and-expired history per (JVM, sfDir): full load
    * (seq 1) tagged 'v1', a mutating INSERT (seq 2), then
    * `expire(keepLast = 1)` — WITHOUT the tag's pin, seq 1 would be
    * past the horizon; `VERSION AS OF 'v1'` must still hash-equal the
    * plain orders aggregate, proving tag resolution reads the pinned
    * manifest, not the live head. */
  private val snapTagPrepared = scala.collection.mutable.Set[String]()
  private def prepareSnapshotTag(s: SparkSession, d: String): String = {
    val root = graft.util.Fs.processScratchRoot("snaptagtt",
      s"_${d.hashCode.toHexString}")
    synchronized {
      if (!snapTagPrepared.contains(root)) {
        graft.util.Fs.deleteRecursively(new java.io.File(root))
        SnapshotStore.write(ordersWithMonth(s, d), root,
          partCol = "order_month", sortCol = "o_orderdate")
        val table = registerSnapCatalog(s, root)
        val name = new java.io.File(root).getName
        s.sql(s"CALL graftsnap.system.tag('$name', 'v1', 1)")
        s.sql(s"INSERT INTO $table SELECT o_orderkey + 4000000000, " +
          "o_custkey, o_orderstatus, o_totalprice, o_orderdate, " +
          s"o_orderpriority, order_month FROM $table " +
          "WHERE o_orderkey % 100 = 1")
        SnapshotStore.expire(root, keepLast = 1)
        snapTagPrepared += root
      }
    }
    root
  }

  /** Tag-addressed time travel THROUGH aggressive retention: the
    * pinned seq-1 state, by name. */
  def snapshotTagTimetravel: Q = (s, d) => {
    val table = registerSnapCatalog(s, prepareSnapshotTag(s, d))
    s.sql(s"""SELECT order_month, count(*) AS cnt,
             | round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,8)))
             |   AS DOUBLE), 4) AS sum_price
             |FROM $table VERSION AS OF 'v1' GROUP BY order_month"""
      .stripMargin)
  }

  /** Batch CHANGE FEED ([[SnapshotStore.changeFeed]], the Delta
    * `table_changes` analogue) over the backfill history: between the
    * full load (seq 1) and the corrected-month restatement (seq 2) the
    * copy-on-write shows as delete(the old last month, every row) +
    * insert(the corrected content) — exactly what DuckDB replays from
    * raw orders. */
  def snapshotChangeFeed: Q = (s, d) => {
    val (root, _) = prepareSnapshotHistory(s, d)
    SnapshotStore.changeFeed(s, root, fromSeq = 1L, toSeq = 2L)
      .groupBy(col("order_month"),
        col("_change_type").as("change_type"))
      .agg(count(lit(1)).as("cnt"),
        round(sum(col("o_totalprice").cast("decimal(38,8)"))
          .cast("double"), 4).as("sum_price"))
  }

  /** Streaming TAIL of the commit chain
    * (`readStream.format("graft-snapshot")`,
    * [[graft.sources.GraftSnapshotMicroBatchStream]]): drain the
    * SQL-INSERT history (two commits: full load + appended batch) from
    * seq 0 with AvailableNow — every dir both commits listed arrives
    * exactly once — and aggregate the drained rows. Must equal the
    * batch read of the same table, i.e. the `snapshot_sql_insert`
    * oracle: one committed history, batch and streaming read APIs.
    * Fresh checkpoint + sink per invocation keeps the lane
    * re-runnable within one JVM. */
  private val tailRuns = new java.util.concurrent.atomic.AtomicInteger()
  def snapshotStreamTail: Q = (s, d) => {
    val root = prepareSnapshotSqlInsert(s, d)
    val n = tailRuns.incrementAndGet()
    val sinkName = s"graft_snapshot_tail_$n"
    val ckpt = graft.util.Fs.processScratchRoot("snaptailck", s"_$n")
    graft.util.Fs.deleteRecursively(new java.io.File(ckpt))
    val q = s.readStream.format("graft-snapshot").load(root)
      .writeStream.format("memory").queryName(sinkName)
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    monthAgg(s.table(sinkName))
  }

  /** Streaming CHANGE FEED
    * (`readStream.format("graft-snapshot").option("readChangeFeed",
    * "true")`, [[graft.sources.GraftSnapshotCdfMicroBatchStream]]):
    * tail the backfill history from seq 1 — batch (1, 2] is the
    * corrected-month restatement as delete(old content) + insert(new),
    * every row `_change_type`-tagged — and aggregate the drained
    * change rows. Must hash-equal the BATCH change feed of the same
    * history (the `snapshot_changefeed` oracle): one history, batch
    * and streaming CDC read APIs. */
  private val cdfRuns = new java.util.concurrent.atomic.AtomicInteger()
  def snapshotStreamCdf: Q = (s, d) => {
    val (root, _) = prepareSnapshotHistory(s, d)
    val n = cdfRuns.incrementAndGet()
    val sinkName = s"graft_snapshot_cdf_$n"
    val ckpt = graft.util.Fs.processScratchRoot("snapcdfck", s"_$n")
    graft.util.Fs.deleteRecursively(new java.io.File(ckpt))
    val q = s.readStream.format("graft-snapshot")
      .option("readChangeFeed", "true").option("startingSeq", 1L)
      .load(root)
      .writeStream.format("memory").queryName(sinkName)
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.table(sinkName)
      .groupBy(col("order_month"),
        col("_change_type").as("change_type"))
      .agg(count(lit(1)).as("cnt"),
        round(sum(col("o_totalprice").cast("decimal(38,8)"))
          .cast("double"), 4).as("sum_price"))
  }

  /** One SQL-DELETEd snapshot history per (JVM, sfDir): full load, then
    * a pure-SQL `DELETE FROM … WHERE order_month IN (min, max)` — the
    * atomic DROP PARTITION (ClickHouse operational practice; an
    * extension, not in the reference): partition-value
    * predicates resolve through [[graft.sources.GraftSnapshotTable]]'s
    * SupportsDelete into the locked metadata-only
    * [[SnapshotStore.dropPartitions]] commit (no data file touched). */
  private val snapSqlDelPrepared = scala.collection.mutable.Set[String]()
  private def prepareSnapshotSqlDelete(s: SparkSession, d: String): String = {
    val root = graft.util.Fs.processScratchRoot("snapdel",
      s"_${d.hashCode.toHexString}")
    synchronized {
      if (!snapSqlDelPrepared.contains(root)) {
        graft.util.Fs.deleteRecursively(new java.io.File(root))
        val orders = ordersWithMonth(s, d)
        SnapshotStore.write(orders, root,
          partCol = "order_month", sortCol = "o_orderdate")
        val table = registerSnapCatalog(s, root)
        // the deleted months come from the DATA (min and max), so the
        // same statement replays at every scale factor; the literals
        // are inlined exactly as a user would write them
        val Array(lo, hi) = orders
          .agg(min("order_month"), max("order_month"))
          .head().toSeq.map(_.toString).toArray
        s.sql(s"DELETE FROM $table WHERE order_month IN ('$lo', '$hi')")
        snapSqlDelPrepared += root
      }
    }
    root
  }

  /** Pure-SQL partition DELETE: the table minus its first and last
    * months, the drop itself a ~KB manifest commit (the oracle replays
    * the same predicate over raw orders). */
  def snapshotSqlDelete: Q = (s, d) =>
    sqlMonthAgg(s, registerSnapCatalog(s, prepareSnapshotSqlDelete(s, d)))

  private def monthAgg(df: DataFrame): DataFrame =
    df.groupBy("order_month")
      .agg(count(lit(1)).as("cnt"),
        round(sum(col("o_totalprice").cast("decimal(38,8)"))
          .cast("double"), 4).as("sum_price"))

  /** The backfill of [[backfillOverwrite]], through the atomic
    * manifest-pointer path ([[SnapshotStore]]): same restatement, same
    * oracle — but the commit is one pointer swap, so a reader racing
    * it sees the whole old or the whole new snapshot (the concurrency
    * spec's claim; this lane checks the committed CONTENT). */
  def snapshotBackfill: Q = (s, d) => {
    val (root, _) = prepareSnapshotHistory(s, d)
    monthAgg(SnapshotStore.read(s, root))
  }

  /** Time travel over the retained manifest history: reading AS OF the
    * pre-backfill snapshot must replay the original load exactly —
    * the restated month's old dirs are still referenced by manifest 1
    * and are never mutated by later commits. */
  def snapshotTimetravel: Q = (s, d) => {
    val (root, id1) = prepareSnapshotHistory(s, d)
    monthAgg(SnapshotStore.read(s, root, asOf = Some(id1)))
  }

  /** Register the snapshot history's parent tmp dir as a
    * [[graft.sources.GraftSnapshotCatalog]] warehouse; returns the
    * catalog-qualified table name. Same conf values every call in one
    * JVM (the pid-suffixed root is fixed per JVM+sfDir), so re-setting
    * is idempotent. */
  private def registerSnapCatalog(s: SparkSession, root: String): String = {
    val f = new java.io.File(root)
    s.conf.set("spark.sql.catalog.graftsnap",
      classOf[graft.sources.GraftSnapshotCatalog].getName)
    s.conf.set("spark.sql.catalog.graftsnap.warehouse", f.getParent)
    s"graftsnap.`${f.getName}`"
  }

  private def sqlMonthAgg(s: SparkSession, table: String): DataFrame =
    s.sql(s"""SELECT order_month, count(*) AS cnt,
             | round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,8)))
             |   AS DOUBLE), 4) AS sum_price
             |FROM $table GROUP BY order_month""".stripMargin)

  /** The pure-SQL read path over the same committed history
    * ([[graft.sources.GraftSnapshotCatalog]]): `spark.sql` against a
    * catalog-registered snapshot table must replay the backfilled
    * state exactly — no Scala API in the query path. */
  def snapshotSql: Q = (s, d) => {
    val (root, _) = prepareSnapshotHistory(s, d)
    sqlMonthAgg(s, registerSnapCatalog(s, root))
  }

  /** One timestamp-travel history per (JVM, sfDir): full load (its
    * commit WALL TIME recorded), then — strictly later on the clock,
    * enforced with a millisecond guard so the two commits can never
    * share a stamp — an INSERT of clone rows. Querying `TIMESTAMP AS
    * OF <first commit's stamp>` must resolve to the FIRST commit (the
    * latest commit at-or-before that instant) and replay the original
    * load exactly; the clones prove a too-late resolution would
    * mismatch. */
  private val snapTsPrepared =
    scala.collection.mutable.Map[String, String]()
  private def prepareSnapshotTsHistory(s: SparkSession, d: String)
      : (String, String) = {
    val root = graft.util.Fs.processScratchRoot("snapts",
      s"_${d.hashCode.toHexString}")
    synchronized {
      if (!snapTsPrepared.contains(root)) {
        graft.util.Fs.deleteRecursively(new java.io.File(root))
        SnapshotStore.write(ordersWithMonth(s, d), root,
          partCol = "order_month", sortCol = "o_orderdate")
        val ts1 = SnapshotStore.current(root).get.ts.get
        // the second commit must stamp strictly AFTER ts1
        while (System.currentTimeMillis() <= ts1) Thread.sleep(1L)
        val table = registerSnapCatalog(s, root)
        s.sql(s"INSERT INTO $table SELECT o_orderkey + 2000000000, " +
          "o_custkey, o_orderstatus, o_totalprice + 1.25, o_orderdate, " +
          s"o_orderpriority, order_month FROM $table " +
          "WHERE o_orderkey % 50 = 3 AND o_orderkey < 2000000000")
        val fmt = java.time.format.DateTimeFormatter
          .ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
          .withZone(java.time.ZoneOffset.UTC)
        snapTsPrepared(root) = fmt.format(
          java.time.Instant.ofEpochMilli(ts1))
      }
    }
    (root, snapTsPrepared(root))
  }

  /** Wall-time time travel: `TIMESTAMP AS OF <first commit's stamp>`
    * equals the original load — the post-stamp INSERT clones must NOT
    * appear (same oracle as the VERSION AS OF lane). */
  def snapshotTimeTravelTs: Q = (s, d) => {
    val (root, tsLit) = prepareSnapshotTsHistory(s, d)
    sqlMonthAgg(s,
      s"${registerSnapCatalog(s, root)} TIMESTAMP AS OF '$tsLit'")
  }

  /** SQL time travel: `VERSION AS OF <first snapshot>` through the
    * catalog equals the Scala `asOf` read — the original load. */
  def snapshotSqlTimetravel: Q = (s, d) => {
    val (root, id1) = prepareSnapshotHistory(s, d)
    sqlMonthAgg(s, s"${registerSnapCatalog(s, root)} VERSION AS OF $id1")
  }

  val queries: Map[String, Q] = Map(
    "etl_backfill_overwrite" -> backfillOverwrite,
    "snapshot_backfill" -> snapshotBackfill,
    "snapshot_timetravel" -> snapshotTimetravel,
    "snapshot_merge" -> snapshotMerge,
    "snapshot_sql" -> snapshotSql,
    "snapshot_sql_timetravel" -> snapshotSqlTimetravel,
    "snapshot_time_travel_ts" -> snapshotTimeTravelTs,
    "snapshot_sql_insert" -> snapshotSqlInsert,
    "snapshot_sql_merge" -> snapshotSqlMerge,
    "snapshot_sql_merge_stmt" -> snapshotSqlMergeStmt,
    "snapshot_sql_merge_cond" -> snapshotSqlMergeCond,
    "snapshot_sql_merge_bysource" -> snapshotSqlMergeBySource,
    "snapshot_sql_overwrite" -> snapshotSqlOverwrite,
    "snapshot_sql_update" -> snapshotSqlUpdate,
    "snapshot_sql_delete_rows" -> snapshotSqlDeleteRows,
    "snapshot_dv_delete" -> snapshotDvDelete,
    "snapshot_dv_update" -> snapshotDvUpdate,
    "snapshot_rewrite_files" -> snapshotRewriteFiles,
    "snapshot_file_prune" -> snapshotFilePrune,
    "snapshot_agg_stats" -> snapshotAggStats,
    "snapshot_agg_dv_count" -> snapshotAggDvCount,
    "snapshot_stats_prune" -> snapshotStatsPrune,
    "snapshot_meta_partitions" -> snapshotMetaPartitions,
    "snapshot_meta_files" -> snapshotMetaFiles,
    "snapshot_agg_group" -> snapshotAggGroup,
    "snapshot_agg_filtered" -> snapshotAggFiltered,
    "snapshot_multipart" -> snapshotMultipart,
    "snapshot_bucket" -> snapshotBucket,
    "snapshot_sql_rename" -> snapshotSqlRename,
    "snapshot_sql_drop" -> snapshotSqlDrop,
    "snapshot_sql_widen" -> snapshotSqlWiden,
    "snapshot_spec_evolve" -> snapshotSpecEvolve,
    "snapshot_evolve_overwrite" -> snapshotEvolveOverwrite,
    "snapshot_branch_wap" -> snapshotBranchWap,
    "snapshot_nested_evolve" -> snapshotNestedEvolve,
    "snapshot_spj" -> snapshotSpj,
    "snapshot_spj_time" -> snapshotSpjTime,
    "snapshot_rollback" -> snapshotRollback,
    "snapshot_sql_ctas" -> snapshotSqlCtas,
    "snapshot_tag_timetravel" -> snapshotTagTimetravel,
    "snapshot_stream_tail" -> snapshotStreamTail,
    "snapshot_changefeed" -> snapshotChangeFeed,
    "snapshot_stream_cdf" -> snapshotStreamCdf,
    "snapshot_cdf_rowlevel" -> snapshotCdfRowlevel,
    "snapshot_sql_delete" -> snapshotSqlDelete,
    "dpp_join" -> dppJoin,
    "etl_bad_records" -> csvBadRecords,
    "schema_evolution" -> schemaEvolution,
    "etl_csv_roundtrip" -> csvRoundtrip,
    "etl_mergetree_roundtrip" -> mergetreeRoundtrip,
    "bucketed_join" -> bucketedJoin,
    "zorder_roundtrip" -> zorderRoundtrip,
    "gen_source_agg" -> genSourceAgg,
    "gen_source_pruned" -> genSourcePruned,
    "etl_jsonl_roundtrip" -> jsonlRoundtrip,
    "etl_orc_roundtrip" -> orcRoundtrip,
  )

  /** 32 shift/mask terms of the 16-bit interleave, as DuckDB SQL. */
  private def interleaveSql(a: String, b: String, bits: Int): String =
    (0 until bits).flatMap(i => Seq(
      s"((($a >> $i) & 1) << ${2 * i})",
      s"((($b >> $i) & 1) << ${2 * i + 1})")).mkString(" | ")

  /** The rolling-hash content checksum over NORMALIZED text — the same
    * replay text_stats pins per doc, summed per language; computed from
    * the parquet source, so a format lane matches only if its
    * round-trip preserved every character. Shared by JSONL and ORC. */
  private val contentChecksumSql: String = {
    val norm = "trim(regexp_replace(regexp_replace(lower(text), " +
      "'[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g'))"
    s"""WITH h AS (SELECT lang, doc_id, n_chars,
       |  CAST(CASE WHEN length($norm) = 0 THEN 0
       |   ELSE list_reduce(list_transform(
       |     generate_series(1, length($norm)),
       |     i -> CAST(ascii($norm[i]) AS BIGINT)),
       |     (acc, c) -> (acc * 31 + c) % 1000000007)
       |   END AS BIGINT) AS rfp
       | FROM documents)
       |SELECT lang, count(*) AS n_docs,
       | CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       | CAST(min(doc_id) AS BIGINT) AS min_id,
       | CAST(max(doc_id) AS BIGINT) AS max_id,
       | CAST(sum(rfp) AS BIGINT) AS content_sum
       |FROM h GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** The MERGE-changeset replay over raw orders — shared by the
    * Scala-API ([[snapshotMerge]]) and SQL-CALL ([[snapshotSqlMerge]])
    * lanes: one oracle, two entry points into the same commit path. */
  /** Shared by the batch and streaming change-feed lanes: the restated
    * last month reads as delete(every original row) + insert(the
    * corrected content). */
  private val snapshotChangeFeedSql: String =
    """WITH o AS (SELECT *, strftime(o_orderdate, '%Y-%m')
      |   AS order_month FROM orders),
      | lm AS (SELECT max(order_month) AS m FROM o),
      | ch AS (
      |  SELECT order_month, 'delete' AS change_type, o_totalprice
      |  FROM o WHERE order_month = (SELECT m FROM lm)
      |  UNION ALL
      |  SELECT order_month, 'insert', o_totalprice + 5.0
      |  FROM o WHERE order_month = (SELECT m FROM lm)
      |    AND o_orderkey % 10 <> 0)
      |SELECT order_month, change_type, count(*) AS cnt,
      | round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,8))) AS DOUBLE), 4)
      |   AS sum_price
      |FROM ch GROUP BY 1, 2""".stripMargin

  private val snapshotMergeOracleSql: String =
    """WITH o AS (SELECT * FROM orders),
      | kept AS (SELECT o_orderdate, o_totalprice FROM o
      |  WHERE o_orderkey % 20 <> 0 AND o_orderkey % 20 <> 10),
      | upd AS (SELECT o_orderdate + INTERVAL 40 DAY AS o_orderdate,
      |   o_totalprice + 10.0 AS o_totalprice FROM o
      |  WHERE o_orderkey % 20 = 10),
      | ins AS (SELECT o_orderdate, o_totalprice + 0.5 AS o_totalprice
      |  FROM o WHERE o_orderkey % 100 = 7),
      | fin AS (SELECT * FROM kept UNION ALL
      |  SELECT * FROM upd UNION ALL SELECT * FROM ins)
      |SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
      | count(*) AS cnt,
      | round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,8))) AS DOUBLE), 4)
      |   AS sum_price
      |FROM fin GROUP BY 1""".stripMargin

  /** The backfill restatement replay (latest month: every 10th order
    * dropped, +5.00) — shared by the Scala-API and SQL-catalog read
    * lanes over the same committed history. */
  private val snapshotBackfillSql: String =
    """WITH o AS (SELECT *, strftime(o_orderdate, '%Y-%m')
      |   AS order_month FROM orders),
      | lm AS (SELECT max(order_month) AS m FROM o),
      | fin AS (
      |  SELECT order_month, o_totalprice FROM o
      |  WHERE order_month <> (SELECT m FROM lm)
      |  UNION ALL
      |  SELECT order_month, o_totalprice + 5.0 FROM o
      |  WHERE order_month = (SELECT m FROM lm)
      |    AND o_orderkey % 10 <> 0)
      |SELECT order_month, count(*) AS cnt,
      | round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,8))) AS DOUBLE), 4)
      |   AS sum_price
      |FROM fin GROUP BY 1""".stripMargin

  val oracle: Map[String, String] = Map(
    // replay the backfill: latest month restated (every 10th order
    // dropped, +5.00 adjustment), all other months as loaded
    "etl_backfill_overwrite" ->
      """WITH o AS (SELECT *, strftime(o_orderdate, '%Y-%m')
        |   AS order_month FROM orders),
        | lm AS (SELECT max(order_month) AS m FROM o),
        | fin AS (
        |  SELECT order_month, o_totalprice FROM o
        |  WHERE order_month <> (SELECT m FROM lm)
        |  UNION ALL
        |  SELECT order_month, o_totalprice + 5.0 FROM o
        |  WHERE order_month = (SELECT m FROM lm)
        |    AND o_orderkey % 10 <> 0)
        |SELECT order_month, count(*) AS cnt,
        | round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,8))) AS DOUBLE), 4)
        |   AS sum_price
        |FROM fin GROUP BY 1""".stripMargin,
    // identical restatement through the atomic manifest-pointer commit
    "snapshot_backfill" -> snapshotBackfillSql,
    // the SAME committed history read through the pure-SQL catalog
    // path (GraftSnapshotCatalog) — one replay, two read APIs
    "snapshot_sql" -> snapshotBackfillSql,
    "snapshot_sql_timetravel" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
        | count(*) AS cnt,
        | round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,8))) AS DOUBLE), 4)
        |   AS sum_price
        |FROM orders GROUP BY 1""".stripMargin,
    // TIMESTAMP AS OF the first commit's wall stamp = the original
    // load — the post-stamp INSERT clones must not leak in (a
    // too-late resolution would add them and mismatch)
    "snapshot_time_travel_ts" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
        | count(*) AS cnt,
        | round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,8))) AS DOUBLE), 4)
        |   AS sum_price
        |FROM orders GROUP BY 1""".stripMargin,
    // replay the MERGE clauses over raw orders: keys ≡0 (mod 20)
    // deleted, ≡10 (mod 20) updated (+10.00, date +40 days, month
    // recomputed), ≡7 (mod 100) cloned as inserts (+2e9 key, +0.50)
    "snapshot_merge" -> snapshotMergeOracleSql,
    // the SQL CALL twin applies the SAME clauses through the same
    // commit path — one oracle, two entry points
    "snapshot_sql_merge" -> snapshotMergeOracleSql,
    // the native MERGE INTO statement: third entry point, same oracle
    "snapshot_sql_merge_stmt" -> snapshotMergeOracleSql,
    // general clause MERGE: target-referencing conditions + partial
    // SET, replayed as a CASE bump (matched F keys) + a filtered drop
    // (matched non-F keys above the target-price threshold);
    // first-match-wins means an F row matching both takes the UPDATE
    "snapshot_sql_merge_cond" ->
      """WITH o AS (SELECT *, strftime(o_orderdate, '%Y-%m')
        |   AS order_month FROM orders),
        | fin AS (SELECT order_month,
        |   CASE WHEN o_orderkey % 20 = 2 AND o_orderstatus = 'F'
        |        THEN o_totalprice + 3.25 ELSE o_totalprice END
        |     AS o_totalprice
        |  FROM o
        |  WHERE NOT (o_orderkey % 20 = 2 AND o_orderstatus <> 'F'
        |             AND o_totalprice > 200000.0))
        |SELECT order_month, count(*) AS cnt,
        | round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,8))) AS DOUBLE), 4)
        |   AS sum_price
        |FROM fin GROUP BY 1""".stripMargin,
    // replay the by-source MERGE over raw orders: the source view
    // drops keys ≡5 (mod 20) — those target rows DELETE when 1998+
    // (first by-source clause) else take the −1.25 markdown (second);
    // matched ≡15 keys get the source-valued +4.50 update. Key classes
    // are disjoint so one CASE replays all three clauses.
    "snapshot_sql_merge_bysource" ->
      """WITH o AS (SELECT *, strftime(o_orderdate, '%Y-%m')
        |   AS order_month FROM orders),
        | fin AS (SELECT order_month,
        |   CASE WHEN o_orderkey % 20 = 15 THEN o_totalprice + 4.5
        |        WHEN o_orderkey % 20 = 5 THEN o_totalprice - 1.25
        |        ELSE o_totalprice END AS o_totalprice
        |  FROM o
        |  WHERE NOT (o_orderkey % 20 = 5
        |             AND o_orderdate >= DATE '1998-01-01'))
        |SELECT order_month, count(*) AS cnt,
        | round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,8))) AS DOUBLE), 4)
        |   AS sum_price
        |FROM fin GROUP BY 1""".stripMargin,
    // pure-SQL dynamic-partition INSERT OVERWRITE replays the same
    // restatement as the Scala backfill — one oracle, three write APIs
    "snapshot_sql_overwrite" -> snapshotBackfillSql,
    // replay the native UPDATE: keys ≡4 (mod 10) get +7.50
    "snapshot_sql_update" ->
      """WITH o AS (SELECT *, strftime(o_orderdate, '%Y-%m')
        |   AS order_month FROM orders),
        | fin AS (SELECT order_month,
        |   CASE WHEN o_orderkey % 10 = 4 AND o_orderdate >= DATE '1998-03-01'
        |        THEN o_totalprice + 7.5
        |        ELSE o_totalprice END AS o_totalprice
        |  FROM o)
        |SELECT order_month, count(*) AS cnt,
        | round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,8))) AS DOUBLE), 4)
        |   AS sum_price
        |FROM fin GROUP BY 1""".stripMargin,
    // replay the multipart-layout DML set over raw orders: two
    // partition-granular DELETEs (AND of both partition columns; OR
    // across them), the row-level UPDATE (+2.50) and the MERGE
    // (+11.25) — key classes ≡1/≡2 (mod 10) are disjoint, so one CASE
    // replays both
    "snapshot_multipart" ->
      """WITH o AS (SELECT *, strftime(o_orderdate, '%Y-%m')
        |   AS order_month FROM orders),
        | kept AS (SELECT * FROM o
        |  WHERE NOT (order_month = '1998-05'
        |             AND o_orderpriority = '1-URGENT')
        |    AND NOT (order_month = '1998-03'
        |             OR o_orderpriority = '3-MEDIUM')),
        | fin AS (SELECT order_month,
        |   CASE WHEN o_orderkey % 10 = 1
        |             AND o_orderdate >= DATE '1998-01-01'
        |        THEN o_totalprice + 2.5
        |        WHEN o_orderkey % 10 = 2 AND order_month = '1998-02'
        |        THEN o_totalprice + 11.25
        |        ELSE o_totalprice END AS o_totalprice
        |  FROM kept)
        |SELECT order_month, count(*) AS cnt,
        | round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,8))) AS DOUBLE), 4)
        |   AS sum_price
        |FROM fin GROUP BY 1""".stripMargin,
    // replay the bucket-layout DML over raw orders: keys ≡7 (mod 10)
    // removed row-exactly (bucket partitions are lossy — a
    // whole-bucket drop would also remove residue-15/…-keys sharing
    // the bucket and mismatch), keys ≡8 (mod 10) from Feb 1998 +3.75
    "snapshot_bucket" ->
      """WITH o AS (SELECT *, strftime(o_orderdate, '%Y-%m')
        |   AS order_month FROM orders),
        | kept AS (SELECT * FROM o WHERE o_orderkey % 10 <> 7),
        | fin AS (SELECT order_month,
        |   CASE WHEN o_orderkey % 10 = 8
        |             AND o_orderdate >= DATE '1998-02-01'
        |        THEN o_totalprice + 3.75 ELSE o_totalprice END
        |     AS o_totalprice
        |  FROM kept)
        |SELECT order_month, count(*) AS cnt,
        | round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,8))) AS DOUBLE), 4)
        |   AS sum_price
        |FROM fin GROUP BY 1""".stripMargin,
    // replay the RENAME lane over raw orders: the renames themselves
    // change no data — the oracle just aliases — while the post-rename
    // INSERT clone (keys ≡3 mod 50, +3e9 key, +1.25) and the UPDATE
    // (+7.50 on keys ≡4 mod 10 of '1998-04', INCLUDING clones whose
    // +3e9 key keeps the residue) replay arithmetically
    "snapshot_sql_rename" ->
      """WITH o AS (SELECT o_orderkey AS k, o_totalprice AS total_price,
        |   strftime(o_orderdate, '%Y-%m') AS month FROM orders),
        | ins AS (SELECT k + 3000000000 AS k,
        |   total_price + 1.25 AS total_price, month
        |  FROM o WHERE k % 50 = 3),
        | allr AS (SELECT * FROM o UNION ALL SELECT * FROM ins),
        | fin AS (SELECT month,
        |   CASE WHEN k % 10 = 4 AND month = '1998-04'
        |        THEN total_price + 7.5 ELSE total_price END
        |     AS total_price
        |  FROM allr)
        |SELECT month, count(*) AS cnt,
        | round(CAST(sum(CAST(total_price AS DECIMAL(38,8))) AS DOUBLE), 4)
        |   AS sum_price
        |FROM fin GROUP BY 1""".stripMargin,
    // replay the DROP+re-ADD over raw orders: every original row's
    // re-added priority is NULL ('none' after coalesce) — the old
    // values must NOT resurface — and the ≡3 (mod 25) clones carry the
    // sentinel with +0.75 price and +4e9 keys
    "snapshot_sql_drop" ->
      """WITH o AS (SELECT *, strftime(o_orderdate, '%Y-%m')
        |   AS order_month FROM orders),
        | base AS (SELECT order_month, 'none' AS pri, o_totalprice
        |  FROM o),
        | ins AS (SELECT order_month, 'READDED' AS pri,
        |   o_totalprice + 0.75 AS o_totalprice
        |  FROM o WHERE o_orderkey % 25 = 3),
        | allr AS (SELECT * FROM base UNION ALL SELECT * FROM ins)
        |SELECT order_month, pri, count(*) AS cnt,
        | round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,8))) AS DOUBLE), 4)
        |   AS sum_price
        |FROM allr GROUP BY 1, 2""".stripMargin,
    // replay the type-widening history over raw orders: clones of ≡11
    // (mod 40) keys carry custkey + 5e9 (a value the pre-widen INT
    // could not hold); original rows sum their plain custkeys
    "snapshot_sql_widen" ->
      """WITH o AS (SELECT *, strftime(o_orderdate, '%Y-%m')
        |   AS order_month FROM orders),
        | ins AS (SELECT o_custkey + 5000000000 AS ck, order_month
        |  FROM o WHERE o_orderkey % 40 = 11),
        | allr AS (SELECT o_custkey AS ck, order_month FROM o
        |  UNION ALL SELECT * FROM ins)
        |SELECT order_month, count(*) AS cnt,
        | CAST(sum(ck) AS BIGINT) AS sum_cust
        |FROM allr GROUP BY 1""".stripMargin,
    // replay the storage-partitioned join over raw orders: a
    // priority-derived adjustment joined back by key, month aggregate
    "snapshot_spj" ->
      """WITH o AS (SELECT *, strftime(o_orderdate, '%Y-%m')
        |   AS order_month FROM orders),
        | b AS (SELECT o_orderkey,
        |   CASE WHEN o_orderpriority = '1-URGENT' THEN 10.0 ELSE 1.0 END
        |     AS adj FROM o)
        |SELECT a.order_month, count(*) AS cnt,
        | round(CAST(sum(CAST(a.o_totalprice + b.adj AS DECIMAL(38,8)))
        |   AS DOUBLE), 4) AS sum_price
        |FROM o a JOIN b ON a.o_orderkey = b.o_orderkey
        |GROUP BY 1""".stripMargin,
    // replay the nested evolution over raw orders: the rename changes
    // no data (the oracle just aliases); originals carry src NULL
    // ('old' after coalesce), the ≡31 (mod 50) clones carry 'NEW' with
    // +0.25 price — a rename stranding either file era reads NULL
    // priorities and lands rows in the wrong groups
    "snapshot_nested_evolve" ->
      """WITH o AS (SELECT o_orderpriority AS pri,
        |   o_totalprice AS price, o_orderkey FROM orders),
        | ins AS (SELECT pri, price + 0.25 AS price, 'NEW' AS src
        |  FROM o WHERE o_orderkey % 50 = 31),
        | allr AS (SELECT pri, price, 'old' AS src FROM o
        |  UNION ALL SELECT * FROM ins)
        |SELECT pri, src, count(*) AS cnt,
        | round(CAST(sum(CAST(price AS DECIMAL(38,8))) AS DOUBLE), 4)
        |   AS sum_price
        |FROM allr GROUP BY 1, 2""".stripMargin,
    // replay the time-transform storage-partitioned join: per-date
    // adjustment (day-of-month cents) joined back by date
    "snapshot_spj_time" ->
      """WITH o AS (SELECT *, strftime(o_orderdate, '%Y-%m')
        |   AS order_month FROM orders),
        | b AS (SELECT DISTINCT o_orderdate,
        |   CAST(day(o_orderdate) AS DOUBLE) * 0.01 AS adj FROM orders)
        |SELECT a.order_month, count(*) AS cnt,
        | round(CAST(sum(CAST(a.o_totalprice + b.adj AS DECIMAL(38,8)))
        |   AS DOUBLE), 4) AS sum_price
        |FROM o a JOIN b ON a.o_orderdate = b.o_orderdate
        |GROUP BY 1""".stripMargin,
    // replay the spec-evolution DML set over raw orders: the ≡9
    // (mod 50) clones insert (+5e9 key, +2.00 — residues mod 10
    // preserved), then ≡9 (mod 10) rows — originals in the OLD month
    // vintage AND clones in the NEW bucketed vintage — get +3.25 when
    // 1998-02+; ≡7 (mod 10) rows from 1998-03+ delete (old vintage)
    "snapshot_spec_evolve" ->
      """WITH o AS (SELECT *, strftime(o_orderdate, '%Y-%m')
        |   AS order_month FROM orders),
        | ins AS (SELECT o_orderkey + 5000000000 AS o_orderkey,
        |   o_totalprice + 2.0 AS o_totalprice, o_orderdate, order_month
        |  FROM o WHERE o_orderkey % 50 = 9),
        | allr AS (
        |  SELECT o_orderkey, o_totalprice, o_orderdate, order_month
        |  FROM o
        |  UNION ALL SELECT * FROM ins),
        | upd AS (SELECT order_month, o_orderdate, o_orderkey,
        |   CASE WHEN o_orderkey % 10 = 9
        |             AND o_orderdate >= DATE '1998-02-01'
        |        THEN o_totalprice + 3.25
        |        WHEN o_orderkey % 20 = 5 THEN o_totalprice + 1.5
        |        ELSE o_totalprice END
        |     AS o_totalprice
        |  FROM allr),
        | fin AS (SELECT * FROM upd
        |  WHERE NOT (o_orderkey % 10 = 7
        |             AND o_orderdate >= DATE '1998-03-01'))
        |SELECT order_month, count(*) AS cnt,
        | round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,8))) AS DOUBLE), 4)
        |   AS sum_price
        |FROM fin GROUP BY 1""".stripMargin,
    // replay the merge-on-read history over raw orders: keys ≡9
    // (mod 100) deleted (the deletion-vector path — a leaked deleted
    // row mismatches the count), keys ≡17 (mod 100) +6.75 (DV delete
    // + additive post-image part). Disjoint key classes, one CASE.
    // the metadata-only aggregates, computed the hard way: min/max
    // across four data types + the full count — a stats-string
    // round-trip error of even one ULP/character hash-mismatches
    "snapshot_agg_stats" ->
      """SELECT count(*) AS cnt,
        | min(o_orderkey) AS mn_key, max(o_orderkey) AS mx_key,
        | min(o_totalprice) AS mn_price, max(o_totalprice) AS mx_price,
        | min(o_orderdate) AS mn_date, max(o_orderdate) AS mx_date,
        | min(o_orderpriority) AS mn_prio, max(o_orderpriority) AS mx_prio
        |FROM orders""".stripMargin,
    // live-row count after the merge-on-read DELETE (the UPDATE is
    // count-neutral): stats rows minus vector positions, exact
    "snapshot_agg_dv_count" ->
      "SELECT count(*) AS cnt FROM orders WHERE o_orderkey % 100 <> 9",
    // the filtered metadata aggregate, recomputed the hard way
    "snapshot_agg_filtered" ->
      """WITH o AS (SELECT *, strftime(o_orderdate, '%Y-%m')
        |   AS order_month FROM orders)
        |SELECT count(*) AS cnt, min(o_orderdate) AS mn_date,
        | max(o_totalprice) AS mx_price
        |FROM o
        |WHERE order_month >= '1997-01' AND order_month < '1998-01'
        |""".stripMargin,
    // the partition-grain stats rollup, recomputed the hard way
    "snapshot_agg_group" ->
      """WITH o AS (SELECT *, strftime(o_orderdate, '%Y-%m')
        |   AS order_month FROM orders)
        |SELECT order_month, count(*) AS cnt,
        | min(o_totalprice) AS mn_price, max(o_orderkey) AS mx_key
        |FROM o GROUP BY 1""".stripMargin,
    // the $partitions metadata table's live-row account, recomputed
    // from raw orders per month
    "snapshot_meta_partitions" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
        | CAST(count(*) AS BIGINT) AS cnt
        |FROM orders GROUP BY 1""".stripMargin,
    // the $files live-row sums over the merge-on-read history: DV'd
    // positions out, additive UPDATE parts in — count-neutral except
    // for the DELETEd key class
    "snapshot_meta_files" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
        | CAST(count(*) AS BIGINT) AS cnt
        |FROM orders WHERE o_orderkey % 100 <> 9 GROUP BY 1""".stripMargin,
    // the file-skipped range aggregate, computed over ALL rows the
    // hard way — a wrongly-pruned entry loses its month's rows and
    // hash-mismatches
    "snapshot_stats_prune" ->
      """WITH o AS (SELECT *, strftime(o_orderdate, '%Y-%m')
        |   AS order_month FROM orders)
        |SELECT order_month, count(*) AS cnt,
        | round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,8))) AS DOUBLE), 4)
        |   AS sum_price
        |FROM o
        |WHERE o_orderdate >= TIMESTAMP '1997-06-15 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-09-15 00:00:00'
        |GROUP BY 1""".stripMargin,
    "snapshot_dv_delete" ->
      """WITH o AS (SELECT *, strftime(o_orderdate, '%Y-%m')
        |   AS order_month FROM orders),
        | fin AS (SELECT order_month,
        |   CASE WHEN o_orderkey % 100 = 17 THEN o_totalprice + 6.75
        |        ELSE o_totalprice END AS o_totalprice
        |  FROM o WHERE o_orderkey % 100 <> 9)
        |SELECT order_month, count(*) AS cnt,
        | round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,8))) AS DOUBLE), 4)
        |   AS sum_price
        |FROM fin GROUP BY 1""".stripMargin,
    // the same merge-on-read state through the priority grain — the
    // additive post-image parts must aggregate exactly once each
    "snapshot_dv_update" ->
      """WITH fin AS (SELECT o_orderpriority,
        |   CASE WHEN o_orderkey % 100 = 17 THEN o_totalprice + 6.75
        |        ELSE o_totalprice END AS o_totalprice
        |  FROM orders WHERE o_orderkey % 100 <> 9)
        |SELECT o_orderpriority, count(*) AS cnt,
        | round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,8))) AS DOUBLE), 4)
        |   AS sum_price
        |FROM fin GROUP BY 1""".stripMargin,
    // the file-skipped 7-day probe, computed over ALL rows the hard
    // way — a wrongly-pruned slice loses its rows and hash-mismatches
    "snapshot_file_prune" ->
      """WITH o AS (SELECT *, strftime(o_orderdate, '%Y-%m')
        |   AS order_month FROM orders)
        |SELECT order_month, count(*) AS cnt,
        | round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,8))) AS DOUBLE), 4)
        |   AS sum_price
        |FROM o
        |WHERE o_orderdate >= TIMESTAMP '1997-06-08 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-06-15 00:00:00'
        |GROUP BY 1""".stripMargin,
    // replay the targeted-maintenance end state: load + the pre-1997
    // clone batch (keys ≡21 mod 50, +0.50) − the pre-1997 deletes
    // (keys ≡9 mod 100); the rewrite itself must be row-invisible
    "snapshot_rewrite_files" ->
      """WITH o AS (SELECT *, strftime(o_orderdate, '%Y-%m')
        |   AS order_month FROM orders),
        | ins AS (SELECT order_month, o_totalprice + 0.50 AS o_totalprice
        |  FROM o WHERE o_orderkey % 50 = 21
        |    AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'),
        | keep AS (SELECT order_month, o_totalprice FROM o
        |  WHERE NOT (o_orderkey % 100 = 9
        |    AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00')
        |  UNION ALL SELECT * FROM ins)
        |SELECT order_month, count(*) AS cnt,
        | round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,8))) AS DOUBLE), 4)
        |   AS sum_price
        |FROM keep GROUP BY 1""".stripMargin,
    // the cross-vintage dynamic overwrite lands the SAME final state
    // as the plain corrected-month backfill — one oracle, with the
    // survivor-migration machinery underneath
    "snapshot_evolve_overwrite" -> snapshotBackfillSql,
    // replay the published WAP state over raw orders: load + the GOOD
    // clone batch (keys ≡21 mod 50, +0.50, +8e9 key) — the abandoned
    // bad batch (price -1e6) must never surface (one leaked row moves
    // a month's sum by a million and mismatches)
    "snapshot_branch_wap" ->
      """WITH o AS (SELECT *, strftime(o_orderdate, '%Y-%m')
        |   AS order_month FROM orders),
        | ins AS (SELECT order_month, o_totalprice + 0.50 AS o_totalprice
        |  FROM o WHERE o_orderkey % 50 = 21),
        | allr AS (SELECT order_month, o_totalprice FROM o
        |  UNION ALL SELECT * FROM ins)
        |SELECT order_month, count(*) AS cnt,
        | round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,8))) AS DOUBLE), 4)
        |   AS sum_price
        |FROM allr GROUP BY 1""".stripMargin,
    // replay the row-level DELETE: keys ≡6 (mod 10) removed
    "snapshot_sql_delete_rows" ->
      """WITH o AS (SELECT *, strftime(o_orderdate, '%Y-%m')
        |   AS order_month FROM orders)
        |SELECT order_month, count(*) AS cnt,
        | round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,8))) AS DOUBLE), 4)
        |   AS sum_price
        |FROM o WHERE NOT (o_orderkey % 10 = 6 AND o_orderdate >= DATE '1998-03-01')
        |GROUP BY 1""".stripMargin,
    // the streaming tail drains the SQL-INSERT history dir-exactly-once
    // — the drained aggregate must equal the batch read's oracle
    "snapshot_stream_tail" ->
      """WITH o AS (SELECT *, strftime(o_orderdate, '%Y-%m')
        |   AS order_month FROM orders),
        | ins AS (SELECT order_month, o_totalprice + 1.25 AS o_totalprice
        |  FROM o WHERE o_orderkey % 50 = 3),
        | fin AS (SELECT order_month, o_totalprice FROM o
        |  UNION ALL SELECT * FROM ins)
        |SELECT order_month, count(*) AS cnt,
        | round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,8))) AS DOUBLE), 4)
        |   AS sum_price
        |FROM fin GROUP BY 1""".stripMargin,
    // replay the SQL INSERT: every key ≡3 (mod 50) cloned (+3e9 key,
    // +1.25 price) on top of the original load
    "snapshot_sql_insert" ->
      """WITH o AS (SELECT *, strftime(o_orderdate, '%Y-%m')
        |   AS order_month FROM orders),
        | ins AS (SELECT order_month, o_totalprice + 1.25 AS o_totalprice
        |  FROM o WHERE o_orderkey % 50 = 3),
        | fin AS (SELECT order_month, o_totalprice FROM o
        |  UNION ALL SELECT * FROM ins)
        |SELECT order_month, count(*) AS cnt,
        | round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,8))) AS DOUBLE), 4)
        |   AS sum_price
        |FROM fin GROUP BY 1""".stripMargin,
    // replay the change feed of the backfill: the restated last month
    // reads as delete(every original row) + insert(corrected content)
    "snapshot_changefeed" -> snapshotChangeFeedSql,
    // the STREAMING change feed drains the same (1, 2] diff — one
    // history, batch and streaming CDC APIs, one oracle
    "snapshot_stream_cdf" -> snapshotChangeFeedSql,
    // ROW-EXACT DML CDC: the feed over (UPDATE, row-DELETE) commits
    // replays the per-commit sidecars — pre/post images for updated
    // keys, delete rows for removed ones, and NOTHING else (the
    // oracle's row set is exactly the changesets, so a wholesale
    // partition emission hash-mismatches immediately)
    "snapshot_cdf_rowlevel" ->
      """WITH o AS (SELECT *, strftime(o_orderdate, '%Y-%m')
        |   AS order_month FROM orders),
        | upd AS (SELECT * FROM o
        |  WHERE o_orderkey % 10 = 4 AND o_orderdate >= DATE '1998-03-01'),
        | del AS (SELECT * FROM o
        |  WHERE o_orderkey % 10 = 6 AND o_orderdate >= DATE '1998-03-01'),
        | ch AS (
        |  SELECT order_month, o_totalprice,
        |    'update_preimage' AS change_type FROM upd
        |  UNION ALL SELECT order_month, o_totalprice + 7.5,
        |    'update_postimage' FROM upd
        |  UNION ALL SELECT order_month, o_totalprice, 'delete' FROM del)
        |SELECT change_type, order_month, count(*) AS cnt,
        | round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,8))) AS DOUBLE), 4)
        |   AS sum_price
        |FROM ch GROUP BY 1, 2""".stripMargin,
    // replay the partition DELETE: the first and last months dropped
    // whole, everything between untouched
    "snapshot_sql_delete" ->
      """WITH o AS (SELECT *, strftime(o_orderdate, '%Y-%m')
        |   AS order_month FROM orders)
        |SELECT order_month, count(*) AS cnt,
        | round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,8))) AS DOUBLE), 4)
        |   AS sum_price
        |FROM o
        |WHERE order_month NOT IN ((SELECT min(order_month) FROM o),
        |                          (SELECT max(order_month) FROM o))
        |GROUP BY 1""".stripMargin,
    // AS OF the pre-backfill snapshot ⇒ the original load, untouched
    // by the later commit
    "snapshot_timetravel" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
        | count(*) AS cnt,
        | round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,8))) AS DOUBLE), 4)
        |   AS sum_price
        |FROM orders GROUP BY 1""".stripMargin,
    // CTAS: lifecycle + load in one statement — the read IS the source
    "snapshot_sql_ctas" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
        | count(*) AS cnt,
        | round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,8))) AS DOUBLE), 4)
        |   AS sum_price
        |FROM orders GROUP BY 1""".stripMargin,
    // tag-addressed time travel through expire: the pinned seq-1 state
    "snapshot_tag_timetravel" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
        | count(*) AS cnt,
        | round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,8))) AS DOUBLE), 4)
        |   AS sum_price
        |FROM orders GROUP BY 1""".stripMargin,
    // rollback restored seq 1 bit-exact: the read IS the original load
    "snapshot_rollback" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
        | count(*) AS cnt,
        | round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,8))) AS DOUBLE), 4)
        |   AS sum_price
        |FROM orders GROUP BY 1""".stripMargin,
    // replay the dim semantics directly: 1996-Q2 = months 04..06
    "dpp_join" ->
      """SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
        | count(*) AS cnt,
        | round(CAST(sum(CAST(l_quantity AS DECIMAL(38,8))) AS DOUBLE), 2)
        |   AS sum_qty
        |FROM lineitem
        |WHERE strftime(l_shipdate, '%Y-%m')
        |  IN ('1996-04', '1996-05', '1996-06')
        |GROUP BY 1""".stripMargin,
    // replay the corruption rule on the source rows: (ok+ln) % 7 == 0
    // rows become unparseable, everything else must survive exactly
    "etl_bad_records" ->
      """SELECT CAST(count(*) AS BIGINT) AS total_rows,
        | CAST(sum(CASE WHEN (l_orderkey + l_linenumber) % 7 = 0
        |   THEN 1 ELSE 0 END) AS BIGINT) AS corrupt_rows,
        | CAST(sum(CASE WHEN (l_orderkey + l_linenumber) % 7 <> 0
        |   THEN 1 ELSE 0 END) AS BIGINT) AS good_rows,
        | round(CAST(sum(CASE WHEN (l_orderkey + l_linenumber) % 7 <> 0
        |   THEN CAST(l_quantity AS DECIMAL(38,8)) END) AS DOUBLE), 4)
        |   AS sum_qty
        |FROM lineitem""".stripMargin,
    "schema_evolution" ->
      """SELECT CASE WHEN o_orderkey % 2 = 0 THEN '<pre-upgrade>'
        |  ELSE o_orderpriority END AS prio,
        | count(*) AS cnt,
        | round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,8))) AS DOUBLE), 4)
        |   AS total
        |FROM orders GROUP BY 1""".stripMargin,
    "gen_source_agg" ->
      """WITH g AS (SELECT unnest(generate_series(0, 99999)) AS i),
        | t AS (SELECT
        |   ['yellow', 'green', 'uber'][CAST(i % 3 AS INT) + 1] AS cab_type,
        |   (i * 7 + 3) % 6 AS passenger_count,
        |   250 + (i * 131) % 4750 AS fare_cents
        |  FROM g)
        |SELECT cab_type, count(*) AS n,
        | CAST(sum(fare_cents) AS BIGINT) AS total_fare_cents,
        | round(avg(CAST(passenger_count AS DOUBLE)), 6) AS avg_passengers
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,
    "etl_jsonl_roundtrip" -> contentChecksumSql,
    "etl_orc_roundtrip" -> contentChecksumSql,
    "gen_source_pruned" ->
      """WITH g AS (SELECT unnest(generate_series(90000, 94999)) AS i),
        | t AS (SELECT i AS trip_id,
        |   ['yellow', 'green', 'uber'][CAST(i % 3 AS INT) + 1] AS cab_type,
        |   250 + (i * 131) % 4750 AS fare_cents
        |  FROM g)
        |SELECT cab_type, count(*) AS n,
        | CAST(min(trip_id) AS BIGINT) AS min_id,
        | CAST(max(trip_id) AS BIGINT) AS max_id,
        | CAST(sum(fare_cents) AS BIGINT) AS total_fare_cents
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,
    "etl_csv_roundtrip" ->
      """SELECT count(*) AS cnt,
        | count(nullif(l_returnflag, 'N')) AS nonnull_flags,
        | count(DISTINCT l_orderkey) AS n_orders,
        | round(CAST(sum(CAST(l_quantity AS DECIMAL(38,8))) AS DOUBLE), 4)
        |   AS sum_qty,
        | max(l_shipdate) AS max_ship
        |FROM lineitem""".stripMargin,
    "etl_mergetree_roundtrip" ->
      """SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
        | count(*) AS cnt, min(l_shipdate) AS min_ship,
        | max(l_shipdate) AS max_ship
        |FROM lineitem GROUP BY 1""".stripMargin,
    "zorder_roundtrip" ->
      s"""WITH o AS (SELECT o_orderkey, o_custkey AS a,
         |   CAST(floor(o_totalprice) AS BIGINT) AS b FROM orders),
         | s AS (SELECT min(a) AS amin, max(a) AS amax,
         |   min(b) AS bmin, max(b) AS bmax FROM o),
         | n AS (SELECT o_orderkey,
         |   CASE WHEN amax = amin THEN 0
         |    ELSE ((a - amin) * 65535) // (amax - amin) END AS na,
         |   CASE WHEN bmax = bmin THEN 0
         |    ELSE ((b - bmin) * 65535) // (bmax - bmin) END AS nb
         |  FROM o CROSS JOIN s)
         |SELECT o_orderkey,
         | CAST(${interleaveSql("na", "nb", 16)} AS BIGINT) AS zv
         |FROM n""".stripMargin,
    "bucketed_join" ->
      """SELECT o_orderpriority, count(*) AS n_items,
        | round(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
        |   AS DECIMAL(38,8))) AS DOUBLE), 2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1""".stripMargin,
  )
}
