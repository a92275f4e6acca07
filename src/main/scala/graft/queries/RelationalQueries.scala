package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The reference's relational operator surface (SURVEY.md §2) re-expressed
  * Spark-first over the driver's TPC-H-ish testdata.
  *
  * The reference (srini-x/nyc-taxi-data-clickhouse) computes four hash
  * aggregations over a denormalized fact table (README.md:606-674), one
  * 4-way broadcast-dimension denormalization join (README.md:366-374), wide
  * derived-column projections (README.md:549-594), membership predicates
  * (:556, :572), catalog row-count reconciliation (:271-278) and a
  * multi-key mixed-direction sort (:674). Each query below maps one of
  * those operator shapes onto the testdata star schema, with a DuckDB
  * oracle in [[oracle]].
  *
  * Scale notes: every aggregation here is a partial→shuffle→final
  * HashAggregate (map-side combine free from Catalyst); every dimension
  * join is explicitly `broadcast(...)` so the 100 TB fact side never
  * shuffles; sorts appear only where the reference semantics demand
  * ordered output (q4).
  */
object RelationalQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Q1 analogue (ref README.md:606): 1 low-cardinality key, count(*). */
  def q1CountByFlag: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("cnt"))

  /** Q2 analogue (ref README.md:626): 1-key avg over a money column.
    * avg rounded to 4dp on both sides: double association order differs
    * between engines at ~1e-12 relative, far below the rounding grain. */
  def q2AvgByStatus: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_linestatus")
      .agg(round(
        sum(col("l_extendedprice").cast("decimal(38,8)")).cast("double")
          / count(lit(1)), 4).as("avg_price"))

  /** Q3 analogue (ref README.md:646-648): 2 keys, one a derived
    * expression (toYear → year()), grouped by alias. */
  def q3CountByFlagYear: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(
        col("l_returnflag"),
        year(col("l_shipdate")).cast("long").as("yr"))
      .agg(count(lit(1)).as("cnt"))

  /** Q4 analogue (ref README.md:670-674): 3 keys, two derived (year,
    * round), high cardinality, ordered output `ORDER BY yr, cnt DESC`
    * where the sort key references an aggregate output (SURVEY.md §2.6 O1). */
  def q4CountThreeKeySorted: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(
        col("l_returnflag"),
        year(col("l_shipdate")).cast("long").as("yr"),
        round(col("l_quantity"), 0).as("dist"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("yr").asc, col("cnt").desc)

  /** Ungrouped scalar count (ref README.md:902, SURVEY.md §2.4 A5). */
  def q5ScalarCount: Q = (s, d) =>
    Tables.lineitem(s, d).agg(count(lit(1)).as("cnt"))

  /** Catalog row-count reconciliation (ref README.md:271-278, S7/A6):
    * per-table exact counts, ordered descending like the reference's
    * `ORDER BY reltuples DESC` (:278). */
  def q6CatalogCounts: Q = (s, d) =>
    graft.util.Catalog.tableCounts(s, d)
      .orderBy(col("cnt").desc, col("tbl").asc)

  /** Denormalization join (ref README.md:366-374, J1-J4): fact side joins
    * four dimensions, one of them (nation) twice under different role
    * aliases — the reference joins nyct2010 twice as pick_up/drop_off.
    *
    * Broadcast hints target ONLY tables whose size is a CONSTANT of the
    * schema: nation (25 rows at every scale factor — like the
    * reference's cab_types/nyct2010 dims). orders, customer and supplier
    * all grow linearly with the fact side (1.5M / 150k / 10k rows per
    * SF); a hard-coded broadcast hint on them is a guaranteed OOM at the
    * 100 TB design point. They join un-hinted: AQE still converts those
    * joins to broadcast at runtime when the measured side fits, and
    * falls back to shuffle joins when it doesn't — the behaviour that
    * survives any scale-up. PlanAudit asserts no explicit hint targets a
    * fact-proportional table. */
  def q7DenormJoin: Q = (s, d) => {
    // the five hash probes run in the scan stage — on a one-row-group
    // input that is one core probing 600 k rows five times; the
    // adaptive spread (guide §2.5) parallelizes the probe stage and
    // disengages on a real many-row-group fact scan
    val li = Tables.spreadIfNarrow(Tables.lineitem(s, d),
      col("l_orderkey"))
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    val su = Tables.supplier(s, d)
    val n = Tables.nation(s, d)
    val custNation = n.select(
      col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
    val suppNation = n.select(
      col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    li.join(o, li("l_orderkey") === o("o_orderkey"), "left")
      .join(c, col("o_custkey") === c("c_custkey"), "left")
      .join(su, li("l_suppkey") === su("s_suppkey"), "left")
      .join(broadcast(custNation), col("c_nationkey") === col("cn_key"), "left")
      .join(broadcast(suppNation), col("s_nationkey") === col("sn_key"), "left")
      .groupBy("cust_nation", "supp_nation")
      .agg(
        count(lit(1)).as("cnt"),
        // per-row double product is bit-identical across engines; casting
        // it to decimal before the sum makes the aggregate exact and
        // association-order-independent (double sums differ ~1e-9 between
        // engines, enough to flip a round-to-cents boundary).
        round(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(38,8)")), 2).cast("double").as("revenue"))
  }

  /** Cast-expression equi-join (ref README.md:369-370, J2): the weather
    * join keys on `weather.date = pickup_datetime::date`. Analogue: a
    * per-day events rollup left-joined to orders on the CAST-to-date of
    * both timestamps. The rollup is tiny → broadcast. */
  def q8CastKeyJoin: Q = (s, d) => {
    val daily = Tables.events(s, d)
      .groupBy(to_date(col("ts")).as("ev_date"))
      .agg(count(lit(1)).as("ev_cnt"),
        round(sum(col("value")), 4).as("ev_value"))
    val o = Tables.orders(s, d)
    o.join(broadcast(daily), to_date(o("o_orderdate")) === daily("ev_date"), "left")
      .groupBy("o_orderstatus")
      .agg(
        count(lit(1)).as("cnt"),
        sum(coalesce(col("ev_cnt"), lit(0L))).as("matched_events"))
  }

  /** Wide projection with renames + derived columns (ref README.md:311-365
    * P1, :549-594 P2): per-row expression evaluation, no shuffle at all —
    * at 100 TB this is a pure map stage with full column pruning. */
  def q9Projection: Q = (s, d) =>
    Tables.lineitem(s, d).select(
      col("l_orderkey").as("order_id"),
      col("l_linenumber").cast("long").as("line_no"),
      col("l_quantity").as("qty"),
      round(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
        .as("revenue"),
      round(col("l_extendedprice") * (lit(1.0) + col("l_tax")), 4)
        .as("gross"),
      concat(col("l_returnflag"), lit("/"), col("l_linestatus")).as("flag_status"),
      to_date(col("l_shipdate")).as("ship_date"))

  /** Membership predicate as value + filter (ref README.md:556 P3: the
    * `IN` result is *stored* as UInt8 0/1, and :572 filters). */
  def q10IsInPredicate: Q = (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_returnflag").isin("A", "R"))
      .groupBy(
        col("l_returnflag"),
        col("l_linestatus").isin("F").cast("long").as("is_final"))
      .agg(count(lit(1)).as("cnt"))

  /** Chained conditional canonicalization (ref README.md:572: 21
    * payment-type spellings → 5 canon codes via nested ternaries). Spark:
    * a when().when().otherwise() chain — a single codegen'd CASE. */
  def q11CaseCanon: Q = (s, d) =>
    Tables.orders(s, d)
      .withColumn("prio_canon",
        when(col("o_orderpriority").startsWith("1"), "URG")
          .when(col("o_orderpriority").startsWith("2"), "HIGH")
          .when(col("o_orderpriority").startsWith("3"), "MED")
          .when(col("o_orderpriority").startsWith("4"), "NOSPEC")
          .otherwise("LOW"))
      .groupBy("prio_canon")
      .agg(count(lit(1)).as("cnt"),
        round(sum(col("o_totalprice").cast("decimal(38,8)")).cast("double")
          / count(lit(1)), 4).as("avg_price"))

  /** Null-default materialization (ref README.md:553-594: ifNull /
    * assumeNotNull with type defaults 0 / '' / epoch-0). The testdata has
    * no physical NULLs, so nulls are synthesized with nullif and then
    * eliminated exactly the way the reference CTAS does. */
  def q12NullDefaults: Q = (s, d) =>
    Tables.orders(s, d)
      .select(
        col("o_orderkey").as("order_id"),
        coalesce(nullif(col("o_orderstatus"), lit("P")), lit("")).as("status_nn"),
        coalesce(nullif(col("o_totalprice"), col("o_totalprice")), lit(0.0))
          .as("price_zeroed"),
        coalesce(
          when(col("o_orderstatus") === "P", col("o_orderdate")),
          to_timestamp(lit("1970-01-01 00:00:00"))).as("date_or_epoch"))

  /** Fixed-width padding + numeric formatting (ref toFixedString
    * README.md:581/:590, lpad/to_char README.md:272). */
  def q13PadFormat: Q = (s, d) =>
    Tables.nation(s, d)
      .select(
        col("n_nationkey").cast("long").as("nation_id"),
        lpad(col("n_name"), 13, " ").as("name_lpad"),
        rpad(col("n_name"), 20, "_").as("name_rpad"),
        substring(col("n_name"), 1, 4).as("name_fixed4"))
      .orderBy("nation_id")

  /** Window top-k (extension surface, SURVEY.md §2.5): top-3 orders by
    * totalprice per priority class. Tie-broken on o_orderkey so both
    * engines rank identically. */
  def q14WindowTopK: Q = (s, d) => {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(s, d)
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 3)
      .select(col("o_orderpriority").as("prio"), col("rk"),
        col("o_orderkey").as("order_id"), col("o_totalprice").as("price"))
  }

  /** Set operations (SURVEY.md §2.7 — absent from the reference's SQL but
    * implied by its file-level shard union README.md:527-532): UNION ALL,
    * then distinct-count to keep output deterministic. */
  def q15SetOps: Q = (s, d) => {
    val o = Tables.orders(s, d)
    val highValue = o.filter(col("o_totalprice") > 100000.0)
      .select(col("o_custkey"))
    val urgent = o.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey"))
    highValue.unionAll(urgent)
      .agg(count(lit(1)).as("cnt"),
        countDistinct(col("o_custkey")).as("distinct_custs"))
  }

  /** Rolling TIME-RANGE window (§2.5 extension): per customer, each
    * order's count and decimal-exact spend over the trailing 30 days —
    * a RANGE frame over event time, not a row frame, so same-day ties
    * are all included regardless of row order (deterministic without a
    * tiebreak). One shuffle on the partition key. */
  def q23RollingWindow: Q = (s, d) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(unix_seconds(col("o_orderdate").cast("timestamp")))
      .rangeBetween(-30L * 24 * 3600, 0)
    Tables.orders(s, d)
      .select(col("o_orderkey").as("order_id"),
        count(lit(1)).over(w).as("n_30d"),
        round(sum(col("o_totalprice").cast("decimal(38,8)")).over(w)
          .cast("double"), 4).as("spend_30d"))
  }

  /** Semi/anti joins (§2.3 extension): per market segment, customers
    * WITH at least one order (left-semi) and WITHOUT any (left-anti).
    * Catalyst plans both as existence joins — no row duplication, and
    * the orders side carries only the join key. */
  def q24SemiAnti: Q = (s, d) => {
    val cust = Tables.customer(s, d)
    val orderKeys = Tables.orders(s, d).select(col("o_custkey"))
    val withO = cust.join(orderKeys,
      cust("c_custkey") === orderKeys("o_custkey"), "leftsemi")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_with_orders"))
    val without = cust.join(orderKeys,
      cust("c_custkey") === orderKeys("o_custkey"), "leftanti")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_no_orders"))
    withO.join(without, Seq("c_mktsegment"), "outer")
      .select(col("c_mktsegment").as("segment"),
        coalesce(col("n_with_orders"), lit(0L)).as("n_with_orders"),
        coalesce(col("n_no_orders"), lit(0L)).as("n_no_orders"))
  }

  /** INTERSECT / EXCEPT (§2.7 completion beyond q15's UNION): customers
    * in both the urgent and high-value cohorts, and urgent-only. Spark
    * and SQL both use distinct set semantics. */
  def q25IntersectExcept: Q = (s, d) => {
    val o = Tables.orders(s, d)
    val urgent = o.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey"))
    val high = o.filter(col("o_totalprice") > 100000.0)
      .select(col("o_custkey"))
    urgent.intersect(high).agg(count(lit(1)).as("n_both"))
      .crossJoin(urgent.except(high)
        .agg(count(lit(1)).as("n_urgent_only")))
  }

  /** Window-function battery (extension beyond the reference, SURVEY.md
    * §2.5): rank, lag, lead, and a running sum per priority class, all
    * deterministically ordered. One shuffle on the partition key; the
    * running sum stays inside the window operator (no second shuffle). */
  def q16WindowAnalytics: Q = (s, d) => {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_orderkey").asc)
    Tables.orders(s, d).select(
      col("o_orderpriority").as("prio"),
      col("o_orderkey").as("order_id"),
      row_number().over(w).cast("long").as("rn"),
      lag(col("o_totalprice"), 1).over(w).as("prev_price"),
      lead(col("o_totalprice"), 1).over(w).as("next_price"),
      round(sum(col("o_totalprice").cast("decimal(38,8)"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("double"), 4)
        .as("running_total"))
  }

  /** DISTINCT aggregates (absent from the reference — SURVEY.md §2.4
    * "not present" — added as extension surface): exact distinct counts
    * shuffle on (group, value) then combine; the HLL approximation
    * (approx_count_distinct) is the 100 TB path and is pinned by spec
    * rather than oracle (sketch internals are engine-specific). */
  def q17DistinctAgg: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_partkey")).as("distinct_parts"),
        countDistinct(col("l_suppkey")).as("distinct_supps"),
        round(sum_distinct(col("l_quantity")), 4).as("sum_distinct_qty"))

  /** ROLLUP grouping-set aggregation (extension): subtotal + grand-total
    * rows computed in one pass — Spark expands grouping sets before the
    * hash aggregate, still partial-combinable at scale. */
  def q18Rollup: Q = (s, d) =>
    Tables.lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("cnt"),
        round(sum(col("l_extendedprice").cast("decimal(38,8)"))
          .cast("double"), 4).as("sum_price"))

  /** Semi-structured parsing (extension): events.props carries JSON;
    * `from_json` with an explicit schema parses it inside codegen — the
    * Spark-native path for JSON columns at scale (schema declared, no
    * sampling pass). Oracle uses a regexp extraction of the same field,
    * so the check is engine-portable. */
  def q19JsonExtract: Q = (s, d) =>
    Tables.events(s, d)
      .select(from_json(col("props"),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.IntegerType))))
        .getField("k").as("k"))
      .groupBy((floor(col("k") / 10) * 10).cast("long").as("k_bucket"))
      .agg(count(lit(1)).as("cnt"),
        countDistinct(col("k")).as("distinct_k"))

  /** Schema-on-read through Spark 4's VARIANT type: `parse_json` once,
    * typed `variant_get` extraction — the open-schema path for
    * semi-structured columns (vs q19's fixed-schema `from_json`). The
    * parse and extraction fuse into the scan stage. */
  def q35Variant: Q = (s, d) =>
    Tables.events(s, d)
      .select(col("event_type"),
        variant_get(parse_json(col("props")), "$.k", "int").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))

  /** ANALYZE-style column statistics (the optimizer-statistics surface:
    * row count, null count, exact NDV, min/max) for a representative
    * column set — one narrow column-pruned scan per column (cheaper
    * than a single multi-distinct pass, which would Expand the fact
    * 5×), unioned into the canonical stats table. min/max are cast to
    * string only for types with engine-identical rendering (integers,
    * strings, dates — never floats). */
  def q34TableStats: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    def statsFor(c: String): DataFrame =
      li.agg(
        count(lit(1)).as("n_rows"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_nulls"),
        countDistinct(col(c)).as("n_distinct"),
        min(col(c)).cast("string").as("min_s"),
        max(col(c)).cast("string").as("max_s"))
        .select(lit(c).as("col_name"), col("n_rows"), col("n_nulls"),
          col("n_distinct"), col("min_s"), col("max_s"))
    Seq("l_orderkey", "l_suppkey", "l_linenumber", "l_returnflag",
      "l_shipdate").map(statsFor).reduce(_ unionAll _)
  }

  /** Explicit GROUPING SETS (completes the grouping-set family beyond
    * q18's ROLLUP and q27's CUBE): an asymmetric set list — each single
    * column plus the grand total, WITHOUT the (flag, status) pair — that
    * neither rollup nor cube can produce. `grouping()` markers
    * disambiguate set-NULLs from data NULLs, the reason the SQL standard
    * has them. Same scale shape as cube: Expand multiplies rows by the
    * set count (3, a constant) before one partial+final HashAggregate. */
  def q36GroupingSets: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq.empty),
        col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping(col("l_returnflag")).cast("int").as("g_flag"),
        grouping(col("l_linestatus")).cast("int").as("g_status"),
        count(lit(1)).as("cnt"),
        round(sum(col("l_extendedprice").cast("decimal(38,8)"))
          .cast("double"), 4).as("sum_price"))

  /** RANGE-frame window (widens §2.5 beyond q23's ROWS frame): per
    * priority class, the trailing-30-day order total — the frame is
    * defined by the ORDER-BY VALUE (day index), not a row count, so all
    * peer orders of a day enter together and the result is independent
    * of intra-day row order (what makes it hash-checkable; a ROWS frame
    * over ties would not be). Money in integer cents for exact sums.
    * One shuffle on the partition key; the frame scan is the standard
    * sliding-window pass within each sorted partition. */
  def q37RangeFrame: Q = (s, d) => {
    val base = Tables.orders(s, d).select(
      col("o_orderkey").as("order_id"),
      col("o_orderpriority").as("prio"),
      datediff(col("o_orderdate").cast("date"), to_date(lit("1992-01-01")))
        .cast("long").as("day_idx"),
      round(col("o_totalprice") * 100).cast("long").as("cents"))
    val w = Window.partitionBy(col("prio")).orderBy(col("day_idx"))
      .rangeBetween(-29, Window.currentRow)
    base.select(col("order_id"), col("prio"), col("day_idx"),
      sum(col("cents")).over(w).as("trail30_cents"),
      count(lit(1)).over(w).as("trail30_orders"))
  }

  /** Histogram quantiles through [[graft.operators.HistogramQuantile]]:
    * the bounded-state sketch variant of q21/q26 whose estimate replays
    * exactly in DuckDB ($500 bins over integer cents). */
  def qQuantileHist: Q = (s, d) =>
    graft.operators.HistogramQuantile.quantiles(
      Tables.lineitem(s, d), "l_returnflag",
      round(col("l_extendedprice") * 100), binWidth = 50000L,
      perUnit = 100L,
      qs = Seq(("p25", 1, 4), ("p50", 1, 2), ("p95", 19, 20)))

  /** HLL approximate distinct (the 100 TB path for A-family distincts:
    * fixed-size sketch, map-side combinable, no (group,value) shuffle).
    * Sketch internals are engine-specific, so the driver check is
    * rows-only; the spec pins the estimate within 5% of exact. */
  def q20ApproxDistinct: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        approx_count_distinct(col("l_partkey")).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"))

  /** Exact interpolated percentiles (absent from the reference §2.4 —
    * "no median/quantile" — added as extension surface). Spark's
    * `percentile` and DuckDB's `quantile_cont` share linear
    * interpolation, so this oracles exactly. At 100 TB the approximate
    * sketch (percentile_approx) replaces it; same plan shape. */
  def q21Percentiles: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        round(expr("percentile(l_extendedprice, 0.25)"), 4).as("p25"),
        round(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(l_extendedprice, 0.95)"), 4).as("p95"))

  /** Approximate percentiles — the sketch that REPLACES q21's exact
    * form at 100 TB (bounded-memory KLL/GK-style digest, mergeable
    * across partitions, vs exact percentile's full value collection per
    * group). Emitted beside the exact values; the accuracy parameter
    * bounds rank error, and the spec pins the gap. Deterministic for a
    * given dataset, but no DuckDB twin → rows-only driver check. */
  def q26ApproxPercentiles: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        round(expr(
          "percentile_approx(l_extendedprice, 0.5, 10000)"), 4).as("ap50"),
        round(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50"),
        round(expr(
          "percentile_approx(l_extendedprice, 0.95, 10000)"), 4).as("ap95"),
        round(expr("percentile(l_extendedprice, 0.95)"), 4).as("p95"))

  /** Pivot (wide aggregation): linestatus counts as columns per
    * returnflag. Spark leaves empty cells null; coalesced to 0 to match
    * the conditional-count formulation every SQL engine uses. */
  def q22Pivot: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(count(lit(1)))
      .select(col("l_returnflag"),
        coalesce(col("F"), lit(0L)).as("cnt_f"),
        coalesce(col("O"), lit(0L)).as("cnt_o"))

  /** Interval-dimension lookup: orders classified into irregular price
    * bands through [[graft.operators.IntervalLookup]] — the bucketized
    * equi-join rewrite of `v BETWEEN lo AND hi` (BroadcastHashJoin, not
    * the O(|fact|·|dim|) BroadcastNestedLoopJoin the naive predicate
    * plans as). */
  def qIntervalLookup: Q = (s, d) => {
    import s.implicits._
    val bands = Seq(
      ("A_micro", 0L, 2000L), ("B_small", 2000L, 9000L),
      ("C_mid", 9000L, 47000L), ("D_large", 47000L, 163000L),
      ("E_jumbo", 163000L, 600000L)).toDF("band", "lo", "hi")
    graft.operators.IntervalLookup.lookup(Tables.orders(s, d),
      "o_totalprice", bands, "lo", "hi", bucketWidth = 25000L)
      .groupBy("band")
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice").cast("decimal(38,8)")).cast("double"),
          4).as("total"))
  }

  /** CUBE grouping sets (completes the grouping-set family beyond q18's
    * ROLLUP): all four (flag, status) slices in one pass. Spark expands
    * the grouping sets before the hash aggregate, so the plan stays
    * partial+final combinable — the expansion multiplies rows by the
    * number of sets (4 here), a constant, not a data-dependent blowup. */
  def q27Cube: Q = (s, d) =>
    Tables.lineitem(s, d)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("cnt"),
        round(sum(col("l_extendedprice").cast("decimal(38,8)"))
          .cast("double"), 4).as("sum_price"))

  /** SCD-2 dimension snapshot (slowly-changing-dimension intervals):
    * collapse each customer's priority history into validity runs —
    * `valid_from` = first order date of a run of equal priorities,
    * `valid_to` = start of the next run (the conventional 9999-12-31
    * sentinel while current — an open interval, and BETWEEN-friendly). The
    * gaps-and-islands build every warehouse dimension pipeline runs:
    * one shuffle on the entity key; the change flags, run ids, and
    * interval bounds all ride the same partitioning (a single Window
    * exchange feeds lag, the running sum, and lead). */
  def q28Scd2: Q = (s, d) => {
    val seq = Window.partitionBy(col("o_custkey"))
      .orderBy(col("odate").asc, col("o_orderkey").asc)
    val runs = Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("odate"),
        col("o_orderpriority").as("prio"))
      .withColumn("chg",
        when(lag(col("prio"), 1).over(seq).isNull ||
          lag(col("prio"), 1).over(seq) =!= col("prio"), 1L).otherwise(0L))
      .withColumn("run_id", sum(col("chg"))
        .over(seq.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val iv = runs
      .groupBy(col("o_custkey").as("custkey"), col("run_id"), col("prio"))
      .agg(min(col("odate")).as("valid_from"),
        count(lit(1)).as("n_orders"))
    val nw = Window.partitionBy(col("custkey")).orderBy(col("run_id").asc)
    iv.select(col("custkey"), col("run_id"), col("prio"),
      col("valid_from"),
      coalesce(lead(col("valid_from"), 1).over(nw),
        to_date(lit("9999-12-31"))).as("valid_to"),
      col("n_orders"))
  }

  /** Point-in-time join — the feature-store operator: for each order,
    * the customer's priority REGIME in force 30 days before the order
    * was placed (training-time features must come from the dimension
    * version valid at label time, never the current one — the
    * leakage-free join every feature store implements). Composed from
    * the SCD-2 interval build (q28) and the native as-of exec:
    * intervals tile contiguously per customer, so "the interval
    * containing t" is exactly the backward as-of against interval
    * STARTS — one merge pass, no interval explode, no BETWEEN
    * nested-loop. Orders whose PIT instant predates the customer's
    * first interval miss (→ 'NONE'/−1), exercising the null carry. */
  def q38PitJoin: Q = (s, d) => {
    // A same-day regime flip creates two intervals with the same
    // valid_from (the earlier one zero-length). "State as of end of
    // day" keeps the LATEST run per (custkey, valid_from) — and the
    // as-of exec requires a deduplicated (key, time) right side anyway.
    val tieW = Window.partitionBy(col("custkey"), col("valid_from"))
      .orderBy(col("run_id").desc)
    val dim = q28Scd2(s, d).select(col("custkey"), col("run_id"),
      col("prio").as("dim_prio"), col("valid_from"))
      .withColumn("_rn", row_number().over(tieW))
      .filter(col("_rn") === 1).drop("_rn")
    val fact = Tables.orders(s, d).select(
      col("o_orderkey").as("order_id"), col("o_custkey"),
      date_sub(col("o_orderdate").cast("date"), 30).as("pit_date"))
    graft.plans.AsOfJoinNative.leftAsOf(
      fact, dim, leftKey = "o_custkey", rightKey = "custkey",
      leftTime = "pit_date", rightTime = "valid_from",
      carry = Seq("run_id", "dim_prio"))
      .select(col("order_id"),
        coalesce(col("dim_prio"), lit("NONE")).as("pit_prio"),
        coalesce(col("run_id"), lit(-1L)).as("pit_run"))
  }

  /** Nested array-of-structs battery (the collect→sort→extract family:
    * `collect_list(struct)` + `sort_array` + `element_at` + struct-field
    * HOFs — the denormalized "entity history as a column" shape nested
    * parquet pipelines live on): each customer's order history as a
    * (date, key, cents) struct array, sorted for determinism (struct
    * comparison is field-order lexicographic in both engines, with the
    * order key as tiebreak), then reduced back to scalars — first/last
    * order, exact total from a struct-field fold. The output stays
    * scalar on purpose: nested values render engine-specifically, but
    * everything DERIVED from them hash-checks. Scale: per-entity
    * history is bounded (~30 orders/customer at every SF), which is
    * the contract any collect_list carries. */
  def q39Nested: Q = (s, d) => {
    val hist = Tables.orders(s, d)
      .select(col("o_custkey").as("custkey"),
        struct(col("o_orderdate").cast("date").as("odate"),
          col("o_orderkey").as("okey"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
          .as("o"))
      .groupBy("custkey")
      .agg(sort_array(collect_list(col("o"))).as("hist"))
    hist.select(col("custkey"),
      size(col("hist")).cast("long").as("n_orders"),
      element_at(col("hist"), 1).getField("odate").as("first_date"),
      element_at(col("hist"), -1).getField("odate").as("last_date"),
      element_at(col("hist"), -1).getField("cents").as("last_cents"),
      aggregate(transform(col("hist"), o => o.getField("cents")),
        lit(0L), (a, x) => a + x).as("total_cents"))
  }

  /** UNPIVOT/melt (q22's pivot inverted — the wide→long reshape, a
    * first-class `Dataset.unpivot` in Spark 4 and an Expand under the
    * hood: rows × |measures|, a constant fan-out that then feeds a
    * normal partial+final aggregate): the four lineitem measures melt
    * to (measure, value) rows and aggregate per measure in exact
    * decimal. */
  def q40Unpivot: Q = (s, d) =>
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"), col("l_tax"))
      .unpivot(
        Array(col("l_orderkey")),
        Array(col("l_quantity"), col("l_extendedprice"),
          col("l_discount"), col("l_tax")),
        "measure", "value")
      .groupBy("measure")
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(38,8)")).cast("double"), 4)
          .as("total"))

  /** `Dataset.observe` instrumentation (the metrics tier: named
    * aggregates collected ON THE FLOW at a chosen plan point, no second
    * scan — how a 100 TB pipeline reports per-stage row/volume counts
    * without re-reading anything): pre-filter totals observed on the
    * scan, post-filter count from the query itself, emitted side by
    * side. The observation is exact and deterministic (count + decimal
    * sum), so the lane oracles like any aggregate. */
  def q41Observe: Q = (s, d) => {
    val obs = org.apache.spark.sql.Observation()
    val filtered = Tables.lineitem(s, d)
      .observe(obs,
        count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast("decimal(38,8)")).as("q"))
      .filter(col("l_returnflag") === "A")
      .agg(count(lit(1)).as("n_a")).head().getLong(0)
    val m = obs.get
    import s.implicits._
    Seq((m("n_rows").asInstanceOf[Long],
      m("q").asInstanceOf[java.math.BigDecimal].doubleValue(),
      filtered))
      .toDF("n_rows", "sum_qty", "n_a")
      .select(col("n_rows"), round(col("sum_qty"), 4).as("sum_qty"),
        col("n_a"))
  }

  /** Exact correlation / covariance statistics per group. Float Σxy
    * accumulation is association-order-dependent (different partitionings
    * → different last-ulp sums → cross-engine hash mismatches), so the
    * moments are integer cents: Σx, Σy as 64-bit, Σxy/Σx²/Σy² as
    * decimal(38,0) — exact, map-side combinable, one narrow shuffle of
    * six numbers per group. The double-precision corr/cov derivation
    * then runs on identical integers in identical expression order in
    * both engines, so even the floating-point result is bit-stable. */
  def q29CorrStats: Q = (s, d) => {
    val li = Tables.lineitem(s, d).select(col("l_returnflag"),
      round(col("l_quantity") * 100).cast("long").as("x"),
      round(col("l_extendedprice") * 100).cast("long").as("y"))
    val m = li.groupBy("l_returnflag").agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum((col("x") * col("y")).cast("decimal(38,0)")).as("sxy"),
      sum((col("x") * col("x")).cast("decimal(38,0)")).as("sxx"),
      sum((col("y") * col("y")).cast("decimal(38,0)")).as("syy"))
    val n = col("n").cast("double")
    val mx = col("sx").cast("double") / n / 100.0
    val my = col("sy").cast("double") / n / 100.0
    val cov = col("sxy").cast("double") / n / 10000.0 - mx * my
    val vx = col("sxx").cast("double") / n / 10000.0 - mx * mx
    val vy = col("syy").cast("double") / n / 10000.0 - my * my
    m.select(col("l_returnflag"), col("n"),
      round(mx, 6).as("mean_qty"), round(my, 6).as("mean_price"),
      round(cov, 6).as("cov_pop"),
      round(cov / (sqrt(vx) * sqrt(vy)), 6).as("corr"))
  }

  /** Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): the status
    * dimension carries a NULL key row ("unknown"), and the fact side's
    * key is NULLed for pending orders — a plain equi-join would drop
    * them; the null-safe join matches them. Still a hash join: null-safe
    * equality is a valid equi-join key (nulls hash to one bucket). */
  def q30NullSafeJoin: Q = (s, d) => {
    import s.implicits._
    val dim = Seq(("F", "final"), ("O", "open"), (null, "unknown"))
      .toDF("k", "label")
    val facts = Tables.orders(s, d)
      .select(nullif(col("o_orderstatus"), lit("P")).as("k"),
        col("o_totalprice"))
    facts.join(broadcast(dim), facts("k") <=> dim("k"))
      .groupBy("label")
      .agg(count(lit(1)).as("cnt"),
        round(sum(col("o_totalprice").cast("decimal(38,8)"))
          .cast("double"), 4).as("total"))
  }

  /** Distribution-rank window battery (ntile / percent_rank /
    * cume_dist — SQL-standard definitions shared by every engine).
    * Deterministic tie-break on the order key; one shuffle on the
    * partition key, all four functions share the single Window. */
  def q33RankFuncs: Q = (s, d) => {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    Tables.orders(s, d).select(
      col("o_orderpriority").as("prio"),
      col("o_orderkey").as("order_id"),
      ntile(4).over(w).as("quartile"),
      round(percent_rank().over(w), 6).as("pct_rank"),
      round(cume_dist().over(w), 6).as("cume"))
  }

  /** Scalar string-function battery (§2.8 analogue surface beyond the
    * reference's own list): all codegen'd built-ins, exact cross-engine
    * semantics (1-based positions, 0-if-absent strpos). */
  def q31Strings: Q = (s, d) =>
    Tables.nation(s, d).select(
      col("n_name").as("name"),
      lower(col("n_name")).as("lc"),
      reverse(col("n_name")).as("rev"),
      expr("repeat(n_name, 2)").as("doubled"),
      substring(col("n_name"), 1, 3).as("first3"),
      expr("right(n_name, 3)").as("last3"),
      instr(col("n_name"), "A").as("pos_a"),
      expr("split_part(n_name, 'A', 1)").as("before_a"),
      regexp_extract(col("n_name"), "([AEIOU]+)", 1).as("first_vowels"),
      translate(col("n_name"), "AEIOU", "aeiou").as("folded"))
      .orderBy("name")

  /** Scalar date/time-function battery: calendar parts, ISO weeks, day
    * names, month boundaries, day arithmetic — the projection runs
    * inside the scan stage (no exchange). */
  def q32Datetime: Q = (s, d) =>
    Tables.orders(s, d).select(
      col("o_orderkey").as("order_id"),
      col("o_orderdate").cast("date").as("odate"))
      .select(
        col("order_id"),
        col("odate"),
        year(col("odate")).cast("long").as("yr"),
        quarter(col("odate")).cast("long").as("qtr"),
        month(col("odate")).cast("long").as("mon"),
        dayofmonth(col("odate")).cast("long").as("dom"),
        date_format(col("odate"), "EEEE").as("day_name"),
        weekofyear(col("odate")).cast("long").as("iso_week"),
        last_day(col("odate")).as("month_end"),
        date_add(col("odate"), 30).as("plus_30d"),
        trunc(col("odate"), "month").as("month_start"),
        datediff(col("odate"), to_date(lit("1995-01-01")))
          .cast("long").as("days_since_95"))

  /** Bloom-pruned selective join ([[graft.operators.RuntimeFilters]]):
    * urgent-order revenue by year. Only ~20% of orders are 1-URGENT, so
    * an unpruned plan shuffles every lineitem row to drop 4 in 5 at the
    * join; here the urgent orderkeys are reduced to a fixed-size Bloom
    * filter applied inside lineitem's scan stage, and only candidate
    * rows reach the exchange. No false negatives → row-identical to
    * the plain join the DuckDB oracle runs (false positives die in the
    * exact join). The row-level complement of `dpp_join`'s
    * partition-level pruning. */
  def q42BloomJoin: Q = (s, d) => {
    val urgent = Tables.orders(s, d)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_orderdate"))
    graft.operators.RuntimeFilters.bloomPrunedJoin(
        Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_extendedprice"),
            col("l_discount")),
        urgent, "l_orderkey", "o_orderkey")
      .groupBy(year(col("o_orderdate").cast("date")).cast("int")
        .as("order_year"))
      .agg(count(lit(1)).as("n_items"),
        round(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(38,8)")).cast("double"), 2).as("revenue"))
  }

  /** Batch MERGE under the gate ([[graft.operators.MergeInto]]): a
    * deterministic changeset — 10%-band price updates, every-97th-key
    * deletes, 10%-band re-keyed inserts — applied to orders in one
    * full-outer join, then the post-merge state summarized per
    * priority (updates surface as their own 'MERGED-UP' group, deletes
    * shrink counts, inserts grow them). The oracle replays the merge
    * algebraically: survivors with CASE'd updates UNION ALL inserts. */
  def qMergeUpsert: Q = (s, d) => {
    val base = Tables.orders(s, d)
    val k = col("o_orderkey")
    val updates = base.filter(k % 10 === 3 && k % 97 =!= 0)
      .withColumn("o_totalprice", col("o_totalprice") * 1.1)
      .withColumn("o_orderpriority", lit("MERGED-UP"))
      .withColumn("_delete", lit(false))
    val deletes = base.filter(k % 97 === 0)
      .withColumn("_delete", lit(true))
    val inserts = base.filter(k % 10 === 7)
      .withColumn("o_orderkey", k + lit(100000000L))
      .withColumn("_delete", lit(false))
    graft.operators.MergeInto.merge(base,
        updates.unionByName(deletes).unionByName(inserts),
        "o_orderkey", "_delete")
      .groupBy(col("o_orderpriority").as("prio"))
      .agg(count(lit(1)).as("cnt"),
        round(sum(col("o_totalprice").cast("decimal(38,8)"))
          .cast("double"), 2).as("total"))
  }

  /** Incremental aggregate maintenance under the gate
    * ([[graft.operators.IncrementalAgg]]): per-priority order totals
    * maintained as mergeable state across three deterministic "append
    * batches" (orderdate thirds standing in for daily loads), merged
    * out of order, then rendered. Must equal the one-shot aggregate the
    * oracle computes — the invariant that lets a 100 TB table keep its
    * rollups current for the cost of each delta. */
  def qIncrAgg: Q = (s, d) => {
    import graft.operators.IncrementalAgg._
    val o = Tables.orders(s, d)
    val day = dayofmonth(col("o_orderdate").cast("date"))
    val batches = Seq(
      o.filter(day <= 10),
      o.filter(day > 20), // merged out of arrival order on purpose
      o.filter(day > 10 && day <= 20))
      .map(b => aggState(b, "o_orderpriority", "o_totalprice"))
    render(mergeStates(batches))
      .withColumnRenamed("o_orderpriority", "prio")
  }

  /** The AUTOMATIC form of q42 ([[graft.plans.BloomJoinInject]]): the
    * user writes the obvious join against the filtered dim — no
    * operator call — and the injected optimizer rule adds the
    * bloom-subquery prune to the probe side. Same oracle as q42: the
    * rewrite must be row-invisible. */
  def q43BloomRewrite: Q = (s, d) =>
    org.apache.spark.sql.GraftPlanBridge.withScopedOptimizerRule(s,
      graft.plans.BloomJoinInject.InjectRule) {
    val urgent = Tables.orders(s, d)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_orderdate"))
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      .join(urgent, col("l_orderkey") === col("o_orderkey"))
      .groupBy(year(col("o_orderdate").cast("date")).cast("int")
        .as("order_year"))
      .agg(count(lit(1)).as("n_items"),
        round(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(38,8)")).cast("double"), 2).as("revenue"))
  }

  /** Triangle count over the SUPPORT-THRESHOLDED co-purchase graph
    * (parts linked when ≥2 DISTINCT orders contain both — the
    * market-basket support cut that separates signal pairs from one-off
    * coincidence; without it a large corpus's co-occurrence graph is
    * near-complete — measured 1.2 M edges / 20 k parts at sf0.1 — and
    * every graph statistic saturates while the wedge join pays the
    * density): the per-order pair expansion is bounded by the 7-line
    * TPC-H order cap (≤21 pairs/order), support is one (a, b) count
    * shuffle, then [[graft.operators.TriangleCount]] counts by degree
    * orientation — the O(√m)-out-degree formulation whose wedge volume
    * survives hub skew at web scale. Oracle: the x<y<z three-way edge
    * join (same count, any orientation). */
  /** Support-thresholded co-purchase edges (canonical src < dst, ≥2
    * distinct orders): pairs per order via ONE orderkey shuffle + an
    * in-row pair expansion (collect_set → sorted array → upper
    * triangle) — not a self-join of the fact table, which would
    * shuffle lineitem twice and add a join exchange for the same
    * 21-pairs/order output. Shared by the triangle and reachability
    * lanes. */
  private def copurchaseEdges(s: SparkSession, d: String): DataFrame = {
    val basket = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(array_sort(collect_set(col("l_partkey"))).as("pks"))
    // two chained explodes (anchor index, then the tail slice) — the
    // nested transform-in-transform HOF form is doubly interpreted
    // (CodegenFallback; the Cooccurrence.skipgrams lesson), while
    // Generate+element_at stays inside codegen on this hot path
    val pairs = basket
      // singleton baskets emit no pairs — and must be filtered BEFORE
      // the sequence: sequence(1, 0) DESCENDS and yields index 0,
      // which element_at rejects (1-based)
      .filter(size(col("pks")) >= 2)
      .select(col("pks"),
        explode(sequence(lit(1), size(col("pks")) - 1)).as("i"))
      .select(element_at(col("pks"), col("i")).as("src"),
        explode(slice(col("pks"), col("i") + 1,
          size(col("pks")) - col("i"))).as("dst"))
    pairs
      .groupBy("src", "dst")
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= 2)
  }

  def q44TriangleCount: Q = (s, d) =>
    graft.operators.TriangleCount.triangles(
      copurchaseEdges(s, d).select("src", "dst"))

  /** Bounded transitive reachability — the RECURSIVE-CTE query class
    * Spark has no native surface for, re-expressed Spark-first as BFS
    * frontier iteration (the PageRank/connected-components discipline:
    * a bounded number of equi-join rounds, frontier minus visited via
    * anti-join, nothing driver-side but the 1-row seed): all parts
    * within 3 hops of the smallest part in the support-thresholded
    * co-purchase graph, each with its MINIMUM hop depth — BFS order
    * makes min-depth deterministic. Oracle: DuckDB's native
    * WITH RECURSIVE, min(depth) per node — two entirely different
    * evaluation strategies, one fixpoint. At scale each round is one
    * hash join of the frontier against the edge list; depth bounds the
    * rounds, the visited anti-join bounds re-expansion, and a frontier
    * that empties early short-circuits the remaining rounds. */
  def q46TransitiveReach: Q = (s, d) => {
    import s.implicits._
    val e = copurchaseEdges(s, d).select("src", "dst")
    // bidirectional adjacency (undirected reachability), pinned once —
    // three BFS rounds re-probe it, and an unpinned frame would re-run
    // the basket expansion per round (the PageRank lesson)
    val adj = e.unionAll(e.select(col("dst").as("src"),
      col("src").as("dst"))).localCheckpoint(true)
    // canonical src < dst ⇒ the global min endpoint always appears as
    // src; one tiny agg seeds the BFS. An empty edge set (no pair
    // reaches support ≥ 2) yields a NULL min — emit the empty result
    // rather than NPE on getLong.
    val seedRow = e.agg(min(col("src"))).head()
    if (seedRow.isNullAt(0))
      Seq.empty[(Long, Long)].toDF("part_id", "depth")
    else {
      val seed = seedRow.getLong(0)
      var visited = Seq((seed, 0L)).toDF("part_id", "depth")
      var frontier = Seq(seed).toDF("part_id")
      var k = 1L
      while (k <= 3L && !frontier.isEmpty) {
        val fresh = frontier.join(adj,
            frontier("part_id") === adj("src"))
          .select(col("dst").as("part_id")).distinct()
          .join(visited.select("part_id"), Seq("part_id"), "left_anti")
          .localCheckpoint(true) // bounded: the round's frontier
        visited = visited.unionAll(
          fresh.select(col("part_id"), lit(k).as("depth")))
        frontier = fresh
        k += 1
      }
      visited
    }
  }

  /** Data-quality constraint battery ([[graft.operators.DataQuality]]):
    * completeness, range, set-membership, non-negativity, composite-key
    * uniqueness — ALL in one conditional-aggregate pass — plus
    * referential integrity lineitem→orders as one distinct+anti-join.
    * The composite key is encoded arithmetically (orderkey·10 +
    * linenumber, linenumber ≤ 7) so both engines distinct-count
    * identical longs. */
  def qDqConstraints: Q = (s, d) => {
    val DQ = graft.operators.DataQuality
    DQ.validate(Tables.lineitem(s, d),
      rows = Seq(
        DQ.notNull("shipdate_not_null", col("l_shipdate")),
        DQ.inRange("quantity_1_50", col("l_quantity"), 1.0, 50.0),
        DQ.inSet("returnflag_enum", col("l_returnflag"),
          Seq("A", "N", "R")),
        DQ.nonNegative("price_nonneg", col("l_extendedprice"))),
      uniqueKey = Some(("pk_unique",
        col("l_orderkey") * 10L + col("l_linenumber"))),
      fk = Some(("fk_orders", col("l_orderkey"),
        Tables.orders(s, d).select("o_orderkey"))))
  }

  /** Exact WEIGHTED quantiles — ClickHouse `quantileExactWeighted`
    * (each value counts with its frequency weight; here: price
    * quantiles weighted by quantity, "what price level does the median
    * UNIT ship at" — a different question from the median line): one
    * in-partition window sort builds the cumulative weight, the
    * quantile is the first value whose cumulative weight crosses
    * q·total — the exact lower-bound rule, decided in INTEGER
    * cross-multiplication (4·cumw ≥ q4·total) so the cut line carries
    * no float. One shuffle on the group key; the window sorts within
    * partitions only (never a single-partition global sort). */
  def qWeightedQuantile: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
      .select(col("l_returnflag").as("flag"),
        col("l_extendedprice").as("v"),
        col("l_quantity").cast("long").as("w"),
        col("l_orderkey"), col("l_linenumber"))
    val ord = Window.partitionBy(col("flag"))
      .orderBy(col("v").asc, col("l_orderkey").asc,
        col("l_linenumber").asc)
    val tot = Window.partitionBy(col("flag"))
    val cum = li
      .withColumn("cumw", sum(col("w")).over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("totw", sum(col("w")).over(tot))
    cum.groupBy("flag")
      .agg(count(lit(1)).as("n_rows"),
        max(col("totw")).as("total_weight"),
        round(min(when(col("cumw") * 4 >= col("totw"), col("v"))), 4)
          .as("wq25"),
        round(min(when(col("cumw") * 2 >= col("totw"), col("v"))), 4)
          .as("wq50"),
        round(min(when(col("cumw") * 4 >= col("totw") * 3, col("v"))), 4)
          .as("wq75"))
  }

  /** Bounded-hop single-source shortest path — the MIN-PLUS semiring
    * fixpoint (a different algebra from [[q46TransitiveReach]]'s
    * reachability: costs ADD along a path and MIN across paths, so a
    * longer-hop route can beat a direct edge): Bellman-Ford relax
    * rounds as pure DataFrame ops — each round joins the tentative
    * distance frame against the adjacency list, adds edge weights, and
    * folds with a groupBy-min; 4 rounds = exact minimum cost over
    * paths of ≤4 edges, the bounded form that replays as a recursive
    * CTE. Edge weight = 11 − min(support, 10): heavily co-purchased
    * pairs are CHEAP hops (integer, ≥1 — costs sum exactly, no float
    * on any path). At scale each round is one frontier-sized hash join
    * + one min shuffle; the distance frame is pinned per round (the
    * PageRank lineage discipline). */
  def q47ShortestPath: Q = (s, d) => {
    import s.implicits._
    val weighted = copurchaseEdges(s, d)
      .select(col("src"), col("dst"),
        (lit(11L) - least(col("support"), lit(10L))).as("w"))
    val adj = weighted.unionAll(weighted.select(col("dst").as("src"),
      col("src").as("dst"), col("w"))).localCheckpoint(true)
    // same empty-edge-set guard as q46: NULL min ⇒ empty result
    val seedRow = weighted.agg(min(col("src"))).head()
    if (seedRow.isNullAt(0))
      Seq.empty[(Long, Long)].toDF("part_id", "cost")
    else {
      val seed = seedRow.getLong(0)
      var dist = Seq((seed, 0L)).toDF("part_id", "cost")
      for (_ <- 1 to 4) {
        val relaxed = dist.join(adj, dist("part_id") === adj("src"))
          .select(col("dst").as("part_id"),
            (col("cost") + col("w")).as("cost"))
        dist = dist.unionAll(relaxed)
          .groupBy("part_id").agg(min(col("cost")).as("cost"))
          .localCheckpoint(true)
      }
      dist
    }
  }

  /** Geo surface on the taxi coordinate distribution (the reference's
    * data IS lat/lon trips; ClickHouse ships greatCircleDistance /
    * geohash — this is that family Spark-first): coordinates derive
    * from lineitem by the same arithmetic [[graft.etl.TaxiGen]] plants
    * (pickup box −74..−72 × 40.5..41.5), distance is the haversine
    * great-circle in pure built-in trig columns — codegen'd end to
    * end, no UDF. Per-row km rounds to 6 dp and sums in
    * decimal(38,8) so the per-group mean is partition-order-free;
    * min/max are order-free by nature. One aggregation, one shuffle
    * of 3 rows per partition. */
  def q48GeoDistance: Q = (s, d) => {
    // 600k haversines on a one-row-group scan = one core doing all the
    // trig; the adaptive spread parallelizes the trig stage (guide
    // §2.5) and column pruning keeps the shuffle to the 5 used columns
    val li = Tables.spreadIfNarrow(Tables.lineitem(s, d),
      col("l_orderkey")).select(
      col("l_returnflag").as("flag"),
      (lit(-74.0) + pmod(col("l_partkey"), lit(2000L)) / 1000.0)
        .as("plon"),
      (lit(40.5) + pmod(col("l_suppkey"), lit(1000L)) / 1000.0)
        .as("plat"),
      (lit(-74.0) + pmod(col("l_suppkey"), lit(2000L)) / 1000.0)
        .as("dlon"),
      (lit(40.5) + pmod(col("l_partkey"), lit(1000L)) / 1000.0)
        .as("dlat"))
    val dphi = radians(col("dlat") - col("plat")) / 2.0
    val dlam = radians(col("dlon") - col("plon")) / 2.0
    val a = sin(dphi) * sin(dphi) +
      cos(radians(col("plat"))) * cos(radians(col("dlat"))) *
        sin(dlam) * sin(dlam)
    val km = lit(2.0 * 6371.0088) * asin(sqrt(a))
    li.withColumn("km", round(km, 6))
      .groupBy("flag")
      .agg(count(lit(1)).as("n_trips"),
        round(sum(col("km").cast("decimal(38,8)")).cast("double") /
          count(lit(1)), 4).as("avg_km"),
        round(min(col("km")), 4).as("min_km"),
        round(max(col("km")), 4).as("max_km"))
  }

  /** Taxi-heatmap grid binning (the geohash-lite aggregation every
    * lat/lon dataset is asked for): pickup coordinates quantized to a
    * 0.01° grid by integer floor — the bin is exact integer arithmetic
    * on the same IEEE doubles both engines compute, so cell membership
    * is engine-identical; one (cell_lat, cell_lon) shuffle bounded by
    * grid cardinality, not rows. */
  def q49GeoGridCells: Q = (s, d) =>
    Tables.lineitem(s, d).select(
      floor((lit(40.5) + pmod(col("l_suppkey"), lit(1000L)) / 1000.0)
        * 100.0).as("cell_lat"),
      floor((lit(-74.0) + pmod(col("l_partkey"), lit(2000L)) / 1000.0)
        * 100.0).as("cell_lon"))
      .groupBy("cell_lat", "cell_lon")
      .agg(count(lit(1)).as("n_pickups"))

  /** Origin–destination flow matrix with top-3 flows per origin — the
    * OD product every trip dataset ships (where do pickups from cell X
    * go?): pickup AND dropoff quantized to the 0.01° grid, one
    * PAIR-keyed count shuffle (the heavy-key shape — |cells|² possible
    * keys vs the heatmap's |cells|, still bounded by grid² not rows),
    * then a per-origin window rank keeps the 3 strongest flows with a
    * deterministic (count DESC, cell) tie order. At 100 TB the pair
    * count is the only row-volume stage; the rank runs over
    * ≤|cells|-sized origin groups. */
  def q50GeoOdFlows: Q = (s, d) => {
    val cells = Tables.lineitem(s, d).select(
      floor((lit(40.5) + pmod(col("l_suppkey"), lit(1000L)) / 1000.0)
        * 100.0).as("o_lat"),
      floor((lit(-74.0) + pmod(col("l_partkey"), lit(2000L)) / 1000.0)
        * 100.0).as("o_lon"),
      floor((lit(40.5) + pmod(col("l_partkey"), lit(1000L)) / 1000.0)
        * 100.0).as("d_lat"),
      floor((lit(-74.0) + pmod(col("l_suppkey"), lit(2000L)) / 1000.0)
        * 100.0).as("d_lon"))
    val flows = cells.groupBy("o_lat", "o_lon", "d_lat", "d_lon")
      .agg(count(lit(1)).as("n_trips"))
    val w = Window.partitionBy(col("o_lat"), col("o_lon"))
      .orderBy(col("n_trips").desc, col("d_lat").asc, col("d_lon").asc)
    flows.withColumn("flow_rank", row_number().over(w).cast("long"))
      .filter(col("flow_rank") <= 3)
  }

  /** Point-in-polygon zone assignment — the PostGIS step the reference
    * pipeline consumes from upstream: its trips carry pre-assigned
    * nyct2010 gid columns (the CTAS keeps them, reference
    * README.md:345-374) and its software stack lists `Postgis-2.4`
    * (README.md:55); the assigning function (PostGIS `ST_Contains`,
    * public API) is never shown in the README itself. Here the
    * assignment runs Spark-first. Containment for convex zones is a
    * conjunction of half-plane cross-product predicates — pure double
    * arithmetic, identical on both engines, fused into the scan stage
    * (no UDF, no spatial lib); the zone battery mixes a triangle (3
    * half-planes), an L1 diamond, a circle, and a rectangle, with
    * first-match priority as the deterministic tie rule on shared
    * borders. At NYC's 263 tracts the same test runs after a grid-cell
    * prefilter against a broadcast polygon table — the candidate set
    * per cell is tiny and the per-candidate test is THIS arithmetic. */
  def q51GeoZoneAssign: Q = (s, d) => {
    // lon from partkey, lat from ORDERKEY — partkey and suppkey are
    // correlated in TPC-H (suppkey derives from partkey), which would
    // confine the points to a few diagonal lines and leave whole zones
    // empty. Each key is spread by a prime coprime to its modulus
    // (7919): a bijection on residues, so coverage of the box does not
    // depend on the key RANGE at a given scale factor (at sf0.001
    // partkey only reaches 200 — unspread, the whole corpus sat in a
    // 0.2°-wide stripe and two zones were empty).
    val pts = Tables.lineitem(s, d).select(
      (lit(-74.0) + pmod(col("l_partkey") * 7919L, lit(2000L)) / 1000.0)
        .as("lon"),
      (lit(40.5) + pmod(col("l_orderkey") * 7919L, lit(1000L)) / 1000.0)
        .as("lat"))
    val lon = col("lon"); val lat = col("lat")
    // triangle (-74.0,40.5) (-73.0,40.5) (-73.5,41.0), CCW half-planes
    val tri = (lat >= 40.5) &&
      (lit(-0.5) * (lat - 40.5) - lit(0.5) * (lon + 73.0) >= 0.0) &&
      (lit(-0.5) * (lat - 41.0) + lit(0.5) * (lon + 73.5) >= 0.0)
    // L1 diamond centred (-73.0, 41.0), radius 0.4
    val diamond = abs(lon + 73.0) + abs(lat - 41.0) <= 0.4
    // circle centred (-72.5, 40.8), r² = 0.09
    val circle = (lon + 72.5) * (lon + 72.5) +
      (lat - 40.8) * (lat - 40.8) <= 0.09
    // rectangle
    val rect = lon >= -73.9 && lon <= -73.4 &&
      lat >= 41.2 && lat <= 41.45
    pts.select(
      when(tri, "tri_south").when(diamond, "diamond_mid")
        .when(circle, "circle_east").when(rect, "rect_north")
        .otherwise("NONE").as("zone"))
      .groupBy("zone")
      .agg(count(lit(1)).as("n_pickups"))
  }

  val queries: Map[String, Q] = Map(
    "geo_zone_assign" -> q51GeoZoneAssign,
    "geo_od_flows" -> q50GeoOdFlows,
    "geo_distance" -> q48GeoDistance,
    "geo_gridcells" -> q49GeoGridCells,
    "shortest_path" -> q47ShortestPath,
    "transitive_reach" -> q46TransitiveReach,
    "weighted_quantile" -> qWeightedQuantile,
    "dq_constraints" -> qDqConstraints,
    "triangle_count" -> q44TriangleCount,
    "q42_bloom_join" -> q42BloomJoin,
    "q43_bloom_rewrite" -> q43BloomRewrite,
    "merge_upsert" -> qMergeUpsert,
    "incr_agg" -> qIncrAgg,
    "interval_lookup" -> qIntervalLookup,
    "q30_nullsafe_join" -> q30NullSafeJoin,
    "q31_strings" -> q31Strings,
    "q32_datetime" -> q32Datetime,
    "q33_rank_funcs" -> q33RankFuncs,
    "q27_cube" -> q27Cube,
    "scd2_intervals" -> q28Scd2,
    "pit_join" -> q38PitJoin,
    "q39_nested" -> q39Nested,
    "q40_unpivot" -> q40Unpivot,
    "q41_observe" -> q41Observe,
    "stat_corr" -> q29CorrStats,
    "q21_percentiles" -> q21Percentiles,
    "q22_pivot" -> q22Pivot,
    "q34_table_stats" -> q34TableStats,
    "q35_variant" -> q35Variant,
    "q36_grouping_sets" -> q36GroupingSets,
    "q37_range_frame" -> q37RangeFrame,
    "quantile_hist" -> qQuantileHist,
    "q19_json_extract" -> q19JsonExtract,
    "q16_window_analytics" -> q16WindowAnalytics,
    "q17_distinct_agg" -> q17DistinctAgg,
    "q18_rollup" -> q18Rollup,
    "q1_count_by_flag" -> q1CountByFlag,
    "q2_avg_by_status" -> q2AvgByStatus,
    "q3_count_by_flag_year" -> q3CountByFlagYear,
    "q4_count_3key_sorted" -> q4CountThreeKeySorted,
    "q5_scalar_count" -> q5ScalarCount,
    "q6_catalog_counts" -> q6CatalogCounts,
    "q7_denorm_join" -> q7DenormJoin,
    "q8_cast_key_join" -> q8CastKeyJoin,
    "q9_projection" -> q9Projection,
    "q10_isin_predicate" -> q10IsInPredicate,
    "q11_case_canon" -> q11CaseCanon,
    "q12_null_defaults" -> q12NullDefaults,
    "q13_pad_format" -> q13PadFormat,
    "q14_window_topk" -> q14WindowTopK,
    "q15_set_ops" -> q15SetOps,
    "q23_rolling_window" -> q23RollingWindow,
    "q24_semi_anti" -> q24SemiAnti,
    "q25_intersect_except" -> q25IntersectExcept,
  )

  /** approx_count_distinct (HLL++) / approx_percentile (t-digest) have
    * engine-specific internals DuckDB cannot replay bit-for-bit; the
    * exact twins `hll_distinct` / `quantile_hist` (custom mergeable
    * sketches with portable oracles) cover the code paths, and
    * NoOracleLanesSpec pins these lanes’ tolerance floors. Kept out
    * of the driver’s oracle sweep. */
  val benchOnly: Map[String, Q] = Map(
    "q20_approx_distinct" -> q20ApproxDistinct,
    "q26_approx_percentiles" -> q26ApproxPercentiles,
  )

  val oracle: Map[String, String] = Map(
    // the same half-plane / L1 / circle / box predicates in the same
    // IEEE doubles, first-match priority
    "geo_zone_assign" ->
      """WITH p AS (SELECT
        |  -74.0 + ((l_partkey * 7919) % 2000) / 1000.0 AS lon,
        |  40.5 + ((l_orderkey * 7919) % 1000) / 1000.0 AS lat
        | FROM lineitem)
        |SELECT CASE
        |  WHEN lat >= 40.5
        |    AND -0.5 * (lat - 40.5) - 0.5 * (lon + 73.0) >= 0.0
        |    AND -0.5 * (lat - 41.0) + 0.5 * (lon + 73.5) >= 0.0
        |    THEN 'tri_south'
        |  WHEN abs(lon + 73.0) + abs(lat - 41.0) <= 0.4
        |    THEN 'diamond_mid'
        |  WHEN (lon + 72.5) * (lon + 72.5)
        |    + (lat - 40.8) * (lat - 40.8) <= 0.09 THEN 'circle_east'
        |  WHEN lon >= -73.9 AND lon <= -73.4
        |    AND lat >= 41.2 AND lat <= 41.45 THEN 'rect_north'
        |  ELSE 'NONE' END AS zone,
        | count(*) AS n_pickups
        |FROM p GROUP BY 1""".stripMargin,
    // pair-keyed counts + the same deterministic (count DESC, cell)
    // rank — top-3 flows per origin
    "geo_od_flows" ->
      """WITH c AS (SELECT
        |  CAST(floor((40.5 + (l_suppkey % 1000) / 1000.0) * 100.0)
        |    AS BIGINT) AS o_lat,
        |  CAST(floor((-74.0 + (l_partkey % 2000) / 1000.0) * 100.0)
        |    AS BIGINT) AS o_lon,
        |  CAST(floor((40.5 + (l_partkey % 1000) / 1000.0) * 100.0)
        |    AS BIGINT) AS d_lat,
        |  CAST(floor((-74.0 + (l_suppkey % 2000) / 1000.0) * 100.0)
        |    AS BIGINT) AS d_lon
        | FROM lineitem),
        |f AS (SELECT o_lat, o_lon, d_lat, d_lon, count(*) AS n_trips
        | FROM c GROUP BY 1, 2, 3, 4)
        |SELECT * FROM (SELECT o_lat, o_lon, d_lat, d_lon, n_trips,
        |  CAST(row_number() OVER (PARTITION BY o_lat, o_lon
        |    ORDER BY n_trips DESC, d_lat, d_lon) AS BIGINT)
        |    AS flow_rank
        | FROM f) WHERE flow_rank <= 3""".stripMargin,
    // identical haversine in DuckDB trig; per-row 6-dp round + exact
    // decimal sum makes the mean order-free on both engines
    "geo_distance" ->
      """WITH c AS (SELECT l_returnflag AS flag,
        |  -74.0 + (l_partkey % 2000) / 1000.0 AS plon,
        |  40.5 + (l_suppkey % 1000) / 1000.0 AS plat,
        |  -74.0 + (l_suppkey % 2000) / 1000.0 AS dlon,
        |  40.5 + (l_partkey % 1000) / 1000.0 AS dlat
        | FROM lineitem),
        |k AS (SELECT flag, round(2.0 * 6371.0088 * asin(sqrt(
        |    sin(radians(dlat - plat) / 2.0) ^ 2
        |    + cos(radians(plat)) * cos(radians(dlat))
        |      * sin(radians(dlon - plon) / 2.0) ^ 2)), 6) AS km
        | FROM c)
        |SELECT flag, count(*) AS n_trips,
        |  round(CAST(sum(CAST(km AS DECIMAL(38,8))) AS DOUBLE)
        |    / count(*), 4) AS avg_km,
        |  round(min(km), 4) AS min_km,
        |  round(max(km), 4) AS max_km
        |FROM k GROUP BY 1""".stripMargin,
    // exact integer floor binning on the same IEEE doubles
    "geo_gridcells" ->
      """SELECT CAST(floor((40.5 + (l_suppkey % 1000) / 1000.0) * 100.0)
        |    AS BIGINT) AS cell_lat,
        |  CAST(floor((-74.0 + (l_partkey % 2000) / 1000.0) * 100.0)
        |    AS BIGINT) AS cell_lon,
        |  count(*) AS n_pickups
        |FROM lineitem GROUP BY 1, 2""".stripMargin,
    // min-plus fixpoint replay: enumerate ≤4-edge paths recursively,
    // min(cost) per node — integer edge weights sum exactly
    "shortest_path" ->
      """WITH RECURSIVE li AS (SELECT DISTINCT l_orderkey AS ok,
        |    l_partkey AS pk FROM lineitem),
        |ce AS (SELECT x.pk AS a, y.pk AS b,
        |    11 - least(count(*), 10) AS w
        |  FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |adj AS (SELECT a, b, w FROM ce
        |  UNION ALL SELECT b, a, w FROM ce),
        |r(node, cost, depth) AS (
        |  SELECT (SELECT min(a) FROM ce), 0, 0
        |  UNION ALL
        |  SELECT adj.b, r.cost + adj.w, r.depth + 1
        |  FROM r JOIN adj ON adj.a = r.node WHERE r.depth < 4)
        |SELECT node AS part_id, CAST(min(cost) AS BIGINT) AS cost
        |FROM r GROUP BY 1""".stripMargin,
    // the recursive-CTE twin of the BFS frontier iteration: DuckDB
    // enumerates ≤3-hop paths natively, min(depth) per node = BFS depth
    "transitive_reach" ->
      """WITH RECURSIVE li AS (SELECT DISTINCT l_orderkey AS ok,
        |    l_partkey AS pk FROM lineitem),
        |ce AS (SELECT x.pk AS a, y.pk AS b
        |  FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |adj AS (SELECT a, b FROM ce UNION ALL SELECT b, a FROM ce),
        |r(node, depth) AS (
        |  SELECT (SELECT min(a) FROM ce), 0
        |  UNION ALL
        |  SELECT adj.b, r.depth + 1 FROM r JOIN adj ON adj.a = r.node
        |  WHERE r.depth < 3)
        |SELECT node AS part_id,
        |  CAST(min(depth) AS BIGINT) AS depth
        |FROM r GROUP BY 1""".stripMargin,
    // cumulative-weight window + integer cross-multiplied cut lines —
    // the identical exact-lower-bound rule
    "weighted_quantile" ->
      """WITH c AS (SELECT l_returnflag AS flag, l_extendedprice AS v,
        |  CAST(l_quantity AS BIGINT) AS w,
        |  sum(CAST(l_quantity AS BIGINT)) OVER (
        |    PARTITION BY l_returnflag
        |    ORDER BY l_extendedprice, l_orderkey, l_linenumber
        |    ROWS UNBOUNDED PRECEDING) AS cumw,
        |  sum(CAST(l_quantity AS BIGINT)) OVER (
        |    PARTITION BY l_returnflag) AS totw
        | FROM lineitem)
        |SELECT flag, count(*) AS n_rows,
        |  CAST(max(totw) AS BIGINT) AS total_weight,
        |  round(min(CASE WHEN cumw * 4 >= totw THEN v END), 4) AS wq25,
        |  round(min(CASE WHEN cumw * 2 >= totw THEN v END), 4) AS wq50,
        |  round(min(CASE WHEN cumw * 4 >= totw * 3 THEN v END), 4)
        |    AS wq75
        |FROM c GROUP BY 1""".stripMargin,
    // one conditional-aggregate pass + one orphan anti-join, unrolled
    // as UNION ALL constraint rows; composite key distinct-counted on
    // the same arithmetic encoding
    "dq_constraints" ->
      """WITH m AS (SELECT count(*) AS n_rows,
        |  CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS v_ship,
        |  CAST(sum(CASE WHEN l_quantity IS NULL
        |    OR (l_quantity >= 1.0 AND l_quantity <= 50.0)
        |    THEN 0 ELSE 1 END) AS BIGINT) AS v_range,
        |  CAST(sum(CASE WHEN l_returnflag IS NULL
        |    OR l_returnflag IN ('A','N','R') THEN 0 ELSE 1 END)
        |    AS BIGINT) AS v_set,
        |  CAST(sum(CASE WHEN l_extendedprice IS NULL
        |    OR l_extendedprice >= 0 THEN 0 ELSE 1 END)
        |    AS BIGINT) AS v_nonneg,
        |  count(*) - count(DISTINCT l_orderkey * 10 + l_linenumber)
        |    AS v_pk
        | FROM lineitem),
        |f AS (SELECT count(*) AS v_fk
        | FROM (SELECT DISTINCT l_orderkey FROM lineitem) c
        | WHERE NOT EXISTS (SELECT 1 FROM orders o
        |   WHERE o.o_orderkey = c.l_orderkey))
        |SELECT u.constraint_name, m.n_rows, u.nv AS n_violations,
        |  u.nv = 0 AS passed
        |FROM m, f, LATERAL (
        |  SELECT 'shipdate_not_null' AS constraint_name, m.v_ship AS nv
        |  UNION ALL SELECT 'quantity_1_50', m.v_range
        |  UNION ALL SELECT 'returnflag_enum', m.v_set
        |  UNION ALL SELECT 'price_nonneg', m.v_nonneg
        |  UNION ALL SELECT 'pk_unique', m.v_pk
        |  UNION ALL SELECT 'fk_orders', f.v_fk) u""".stripMargin,
    // co-purchase edges (canonical a<b), triangles as the x<y<z
    // three-way join — orientation-free, same count as the degree-
    // oriented engine path
    "triangle_count" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem),
        |e AS (SELECT x.pk AS a, y.pk AS b
        |  FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |v AS (SELECT a AS v FROM e UNION SELECT b FROM e)
        |SELECT (SELECT count(*) FROM v) AS n_nodes,
        |  (SELECT count(*) FROM e) AS n_edges,
        |  (SELECT count(*) FROM e e1
        |     JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
        |     JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b) AS n_triangles""".stripMargin,
    // ANALYZE replay: one stats row per column; min/max stringified
    // only for engine-identical renderings (ints, strings, timestamps)
    "q34_table_stats" -> Seq("l_orderkey", "l_suppkey", "l_linenumber",
      "l_returnflag", "l_shipdate").map { c =>
      s"""SELECT '$c' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
         | CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |   AS n_nulls,
         | CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
         | CAST(min($c) AS VARCHAR) AS min_s,
         | CAST(max($c) AS VARCHAR) AS max_s
         |FROM lineitem""".stripMargin
    }.mkString("\nUNION ALL\n"),
    // asymmetric grouping-set list + GROUPING() markers; count/sum per
    // set replayed directly
    "q36_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
        | CAST(GROUPING(l_linestatus) AS INT) AS g_status,
        | count(*) AS cnt,
        | round(CAST(sum(CAST(l_extendedprice AS DECIMAL(38,8))) AS DOUBLE), 4)
        |   AS sum_price
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin,
    // value-defined RANGE frame over the integer day index — peers of a
    // day enter the frame together in both engines
    "q37_range_frame" ->
      """WITH o AS (SELECT o_orderkey AS order_id,
        |  o_orderpriority AS prio,
        |  date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
        |    AS day_idx,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        | FROM orders)
        |SELECT order_id, prio, day_idx,
        | CAST(sum(cents) OVER w AS BIGINT) AS trail30_cents,
        | count(*) OVER w AS trail30_orders
        |FROM o
        |WINDOW w AS (PARTITION BY prio ORDER BY day_idx
        |  RANGE BETWEEN 29 PRECEDING AND CURRENT ROW)""".stripMargin,
    // the histogram sketch replayed stage for stage: binning, cumulative
    // counts, ceil-rank pick, fixed-order IEEE interpolation
    "quantile_hist" ->
      """WITH h AS (SELECT l_returnflag AS g,
        |   CAST(round(l_extendedprice * 100) AS BIGINT) // 50000 AS bin,
        |   count(*) AS cnt
        |  FROM lineitem GROUP BY 1, 2),
        | c AS (SELECT g, bin, cnt,
        |   sum(cnt) OVER (PARTITION BY g ORDER BY bin) AS cum,
        |   sum(cnt) OVER (PARTITION BY g) AS n
        |  FROM h),
        | q(q_label, qn, qd) AS (SELECT * FROM (VALUES
        |   ('p25', 1, 4), ('p50', 1, 2), ('p95', 19, 20))),
        | t AS (SELECT g, q_label, bin, cnt, cum, n,
        |   (n * qn + qd - 1) // qd AS target FROM c, q)
        |SELECT g AS l_returnflag, q_label,
        | CAST(target AS BIGINT) AS target_rank,
        | round((CAST(bin * 50000 AS DOUBLE)
        |   + 50000.0 * (CAST(target - (cum - cnt) AS DOUBLE)
        |     / CAST(cnt AS DOUBLE)))
        |   / 100.0, 6) AS est
        |FROM t WHERE cum >= target AND cum - cnt < target""".stripMargin,
    // the single-int-field props make regexp and variant extraction
    // agree; same replay style as q19
    "q35_variant" ->
      """SELECT event_type, count(*) AS cnt,
        | CAST(sum(CAST(regexp_extract(props, '[0-9]+') AS INT))
        |   AS BIGINT) AS sum_k,
        | CAST(min(CAST(regexp_extract(props, '[0-9]+') AS INT)) AS INT)
        |   AS min_k,
        | CAST(max(CAST(regexp_extract(props, '[0-9]+') AS INT)) AS INT)
        |   AS max_k
        |FROM events GROUP BY 1""".stripMargin,
    "q30_nullsafe_join" ->
      """WITH dim(k, label) AS (VALUES
        |  ('F', 'final'), ('O', 'open'), (NULL, 'unknown')),
        | f AS (SELECT nullif(o_orderstatus, 'P') AS k, o_totalprice
        |  FROM orders)
        |SELECT label, count(*) AS cnt,
        | round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,8))) AS DOUBLE), 4)
        |   AS total
        |FROM f JOIN dim ON f.k IS NOT DISTINCT FROM dim.k
        |GROUP BY 1""".stripMargin,
    "q33_rank_funcs" ->
      """SELECT o_orderpriority AS prio, o_orderkey AS order_id,
        | CAST(ntile(4) OVER w AS INT) AS quartile,
        | round(percent_rank() OVER w, 6) AS pct_rank,
        | round(cume_dist() OVER w, 6) AS cume
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |  ORDER BY o_totalprice ASC, o_orderkey ASC)""".stripMargin,
    "q31_strings" ->
      """SELECT n_name AS name,
        | lower(n_name) AS lc,
        | reverse(n_name) AS rev,
        | repeat(n_name, 2) AS doubled,
        | substring(n_name, 1, 3) AS first3,
        | right(n_name, 3) AS last3,
        | CAST(strpos(n_name, 'A') AS INT) AS pos_a,
        | split_part(n_name, 'A', 1) AS before_a,
        | regexp_extract(n_name, '([AEIOU]+)', 1) AS first_vowels,
        | translate(n_name, 'AEIOU', 'aeiou') AS folded
        |FROM nation ORDER BY name""".stripMargin,
    "q32_datetime" ->
      """SELECT o_orderkey AS order_id,
        | CAST(o_orderdate AS DATE) AS odate,
        | year(CAST(o_orderdate AS DATE)) AS yr,
        | quarter(CAST(o_orderdate AS DATE)) AS qtr,
        | month(CAST(o_orderdate AS DATE)) AS mon,
        | day(CAST(o_orderdate AS DATE)) AS dom,
        | dayname(CAST(o_orderdate AS DATE)) AS day_name,
        | weekofyear(CAST(o_orderdate AS DATE)) AS iso_week,
        | last_day(CAST(o_orderdate AS DATE)) AS month_end,
        | CAST(o_orderdate AS DATE) + 30 AS plus_30d,
        | date_trunc('month', CAST(o_orderdate AS DATE)) AS month_start,
        | date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
        |   AS days_since_95
        |FROM orders""".stripMargin,
    // the one-shot aggregate the incremental state-merge must equal
    "incr_agg" ->
      """SELECT o_orderpriority AS prio, count(*) AS cnt,
        | round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,8))) AS DOUBLE), 2)
        |   AS total,
        | round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,8))) AS DOUBLE)
        |   / count(*), 6) AS avg
        |FROM orders GROUP BY 1""".stripMargin,
    // merge replayed algebraically: %97 deletes vanish via WHERE, %10=3
    // updates via CASE, %10=7 inserts via UNION ALL (their new keys
    // don't matter to the aggregate)
    "merge_upsert" ->
      """WITH merged AS (
        | SELECT CASE WHEN o_orderkey % 10 = 3 THEN 'MERGED-UP'
        |   ELSE o_orderpriority END AS prio,
        |  CASE WHEN o_orderkey % 10 = 3 THEN o_totalprice * 1.1
        |   ELSE o_totalprice END AS price
        | FROM orders WHERE o_orderkey % 97 <> 0
        | UNION ALL
        | SELECT o_orderpriority AS prio, o_totalprice AS price
        | FROM orders WHERE o_orderkey % 10 = 7)
        |SELECT prio, count(*) AS cnt,
        | round(CAST(sum(CAST(price AS DECIMAL(38,8))) AS DOUBLE), 2)
        |   AS total
        |FROM merged GROUP BY 1""".stripMargin,
    // the auto-injected rewrite must equal the same unpruned join
    "q43_bloom_rewrite" ->
      """SELECT CAST(year(CAST(o_orderdate AS DATE)) AS INT) AS order_year,
        | count(*) AS n_items,
        | round(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
        |   AS DECIMAL(38,8))) AS DOUBLE), 2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY 1""".stripMargin,
    // the oracle is the UNPRUNED join — bloom pruning must be
    // row-invisible (no false negatives; false positives rejected by
    // the exact join)
    "q42_bloom_join" ->
      """SELECT CAST(year(CAST(o_orderdate AS DATE)) AS INT) AS order_year,
        | count(*) AS n_items,
        | round(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
        |   AS DECIMAL(38,8))) AS DOUBLE), 2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY 1""".stripMargin,
    "q27_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
        | round(CAST(sum(CAST(l_extendedprice AS DECIMAL(38,8))) AS DOUBLE), 4)
        |   AS sum_price
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin,
    // observe metrics replay as plain aggregates: pre-filter totals +
    // the post-filter count
    "q41_observe" ->
      """SELECT count(*) AS n_rows,
        | round(CAST(sum(CAST(l_quantity AS DECIMAL(38,8))) AS DOUBLE), 4)
        |   AS sum_qty,
        | CAST(sum(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END)
        |   AS BIGINT) AS n_a
        |FROM lineitem""".stripMargin,
    // wide→long reshape replayed with DuckDB's UNPIVOT; per-measure
    // totals in exact decimal
    "q40_unpivot" ->
      """WITH u AS (
        | SELECT l_orderkey, measure, value FROM (
        |   SELECT l_orderkey, l_quantity, l_extendedprice, l_discount,
        |     l_tax FROM lineitem)
        | UNPIVOT (value FOR measure IN (l_quantity, l_extendedprice,
        |   l_discount, l_tax)))
        |SELECT measure, count(*) AS n,
        | round(CAST(sum(CAST(value AS DECIMAL(38,8))) AS DOUBLE), 4)
        |   AS total
        |FROM u GROUP BY 1""".stripMargin,
    // the nested battery replayed: list(struct_pack) + list_sort share
    // Spark's field-order struct comparison; scalars extracted the
    // same way
    "q39_nested" ->
      """WITH h AS (SELECT o_custkey AS custkey,
        |  list_sort(list(struct_pack(
        |    odate := CAST(o_orderdate AS DATE),
        |    okey := o_orderkey,
        |    cents := CAST(round(o_totalprice * 100) AS BIGINT)))) AS hist
        | FROM orders GROUP BY 1)
        |SELECT custkey,
        | CAST(len(hist) AS BIGINT) AS n_orders,
        | hist[1].odate AS first_date,
        | hist[-1].odate AS last_date,
        | hist[-1].cents AS last_cents,
        | CAST(list_sum(list_transform(hist, s -> s.cents)) AS BIGINT)
        |   AS total_cents
        |FROM h""".stripMargin,
    // the PIT join replayed: same SCD-2 CTE chain, then DuckDB's native
    // ASOF LEFT JOIN picks the latest interval start <= the PIT instant
    "pit_join" ->
      """WITH seqd AS (SELECT o_custkey, o_orderkey,
        |   CAST(o_orderdate AS DATE) AS odate, o_orderpriority AS prio,
        |   CASE WHEN lag(o_orderpriority) OVER w IS NULL
        |     OR lag(o_orderpriority) OVER w <> o_orderpriority
        |     THEN 1 ELSE 0 END AS chg
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey
        |    ORDER BY CAST(o_orderdate AS DATE), o_orderkey)),
        | runs AS (SELECT *, sum(chg) OVER (PARTITION BY o_custkey
        |   ORDER BY odate, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
        |  FROM seqd),
        | iv AS (SELECT o_custkey AS custkey,
        |   CAST(run_id AS BIGINT) AS run_id, prio,
        |   min(odate) AS valid_from
        |  FROM runs GROUP BY 1, 2, 3),
        | dim AS (SELECT custkey, run_id, prio, valid_from
        |  FROM (SELECT *, row_number() OVER (PARTITION BY custkey,
        |     valid_from ORDER BY run_id DESC) AS rn FROM iv)
        |  WHERE rn = 1),
        | fact AS (SELECT o_orderkey AS order_id, o_custkey,
        |   CAST(o_orderdate AS DATE) - 30 AS pit_date FROM orders)
        |SELECT f.order_id,
        | coalesce(d.prio, 'NONE') AS pit_prio,
        | coalesce(d.run_id, CAST(-1 AS BIGINT)) AS pit_run
        |FROM fact f ASOF LEFT JOIN dim d
        | ON f.o_custkey = d.custkey AND f.pit_date >= d.valid_from""".stripMargin,
    "scd2_intervals" ->
      """WITH seqd AS (SELECT o_custkey, o_orderkey,
        |   CAST(o_orderdate AS DATE) AS odate, o_orderpriority AS prio,
        |   CASE WHEN lag(o_orderpriority) OVER w IS NULL
        |     OR lag(o_orderpriority) OVER w <> o_orderpriority
        |     THEN 1 ELSE 0 END AS chg
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey
        |    ORDER BY CAST(o_orderdate AS DATE), o_orderkey)),
        | runs AS (SELECT *, sum(chg) OVER (PARTITION BY o_custkey
        |   ORDER BY odate, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
        |  FROM seqd),
        | iv AS (SELECT o_custkey AS custkey, run_id, prio,
        |   min(odate) AS valid_from, count(*) AS n_orders
        |  FROM runs GROUP BY 1, 2, 3)
        |SELECT custkey, CAST(run_id AS BIGINT) AS run_id, prio, valid_from,
        | coalesce(lead(valid_from) OVER (PARTITION BY custkey
        |     ORDER BY run_id), DATE '9999-12-31') AS valid_to,
        | n_orders
        |FROM iv""".stripMargin,
    "stat_corr" ->
      """WITH c AS (SELECT l_returnflag,
        |   CAST(round(l_quantity * 100) AS BIGINT) AS x,
        |   CAST(round(l_extendedprice * 100) AS BIGINT) AS y
        |  FROM lineitem),
        | m AS (SELECT l_returnflag, count(*) AS n,
        |   CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |   sum(CAST(x AS DECIMAL(38,0)) * y) AS sxy,
        |   sum(CAST(x AS DECIMAL(38,0)) * x) AS sxx,
        |   sum(CAST(y AS DECIMAL(38,0)) * y) AS syy
        |  FROM c GROUP BY 1)
        |SELECT l_returnflag, n,
        | round(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) / 100.0, 6) AS mean_qty,
        | round(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) / 100.0, 6) AS mean_price,
        | round(CAST(sxy AS DOUBLE) / CAST(n AS DOUBLE) / 10000.0
        |   - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) / 100.0)
        |     * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) / 100.0), 6) AS cov_pop,
        | round((CAST(sxy AS DOUBLE) / CAST(n AS DOUBLE) / 10000.0
        |   - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) / 100.0)
        |     * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) / 100.0))
        |  / (sqrt(CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE) / 10000.0
        |     - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) / 100.0)
        |       * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) / 100.0))
        |   * sqrt(CAST(syy AS DOUBLE) / CAST(n AS DOUBLE) / 10000.0
        |     - (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) / 100.0)
        |       * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) / 100.0))), 6)
        |   AS corr
        |FROM m""".stripMargin,
    "interval_lookup" ->
      """WITH bands(band, lo, hi) AS (VALUES
        |  ('A_micro', 0, 2000), ('B_small', 2000, 9000),
        |  ('C_mid', 9000, 47000), ('D_large', 47000, 163000),
        |  ('E_jumbo', 163000, 600000))
        |SELECT band, count(*) AS n_orders,
        | round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,8))) AS DOUBLE), 4)
        |   AS total
        |FROM orders JOIN bands
        | ON o_totalprice >= lo AND o_totalprice < hi
        |GROUP BY 1""".stripMargin,
    "q21_percentiles" ->
      """SELECT l_returnflag,
        | round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
        | round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
        | round(quantile_cont(l_extendedprice, 0.95), 4) AS p95
        |FROM lineitem GROUP BY 1""".stripMargin,
    "q22_pivot" ->
      """SELECT l_returnflag,
        | count(CASE WHEN l_linestatus = 'F' THEN 1 END) AS cnt_f,
        | count(CASE WHEN l_linestatus = 'O' THEN 1 END) AS cnt_o
        |FROM lineitem GROUP BY 1""".stripMargin,
    "q19_json_extract" ->
      """SELECT CAST(floor(CAST(regexp_extract(props, '[0-9]+') AS INT) / 10) * 10 AS BIGINT) AS k_bucket,
        | count(*) AS cnt,
        | count(DISTINCT CAST(regexp_extract(props, '[0-9]+') AS INT)) AS distinct_k
        |FROM events GROUP BY 1""".stripMargin,
    "q16_window_analytics" ->
      """SELECT o_orderpriority AS prio, o_orderkey AS order_id,
        | CAST(row_number() OVER w AS BIGINT) AS rn,
        | lag(o_totalprice, 1) OVER w AS prev_price,
        | lead(o_totalprice, 1) OVER w AS next_price,
        | round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,8))) OVER
        |   (PARTITION BY o_orderpriority ORDER BY o_orderkey ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 4)
        |   AS running_total
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderkey ASC)""".stripMargin,
    "q17_distinct_agg" ->
      """SELECT l_returnflag,
        | count(DISTINCT l_partkey) AS distinct_parts,
        | count(DISTINCT l_suppkey) AS distinct_supps,
        | round(sum(DISTINCT l_quantity), 4) AS sum_distinct_qty
        |FROM lineitem GROUP BY 1""".stripMargin,
    "q18_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
        | round(CAST(sum(CAST(l_extendedprice AS DECIMAL(38,8))) AS DOUBLE), 4)
        |   AS sum_price
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,
    "q1_count_by_flag" ->
      "SELECT l_returnflag, count(*) AS cnt FROM lineitem GROUP BY l_returnflag",
    "q2_avg_by_status" ->
      "SELECT l_linestatus, round(CAST(sum(CAST(l_extendedprice AS DECIMAL(38,8))) AS DOUBLE) / count(*), 4) AS avg_price FROM lineitem GROUP BY l_linestatus",
    "q3_count_by_flag_year" ->
      "SELECT l_returnflag, year(l_shipdate) AS yr, count(*) AS cnt FROM lineitem GROUP BY 1, 2",
    "q4_count_3key_sorted" ->
      "SELECT l_returnflag, year(l_shipdate) AS yr, round(l_quantity) AS dist, count(*) AS cnt FROM lineitem GROUP BY 1, 2, 3 ORDER BY yr, cnt DESC",
    "q5_scalar_count" ->
      "SELECT count(*) AS cnt FROM lineitem",
    "q6_catalog_counts" ->
      ("SELECT tbl, cnt FROM (" +
        Seq("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")
          .map(t => s"SELECT '$t' AS tbl, count(*) AS cnt FROM $t")
          .mkString(" UNION ALL ") +
        ") ORDER BY cnt DESC, tbl ASC"),
    "q7_denorm_join" ->
      """SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
        | count(*) AS cnt,
        | CAST(round(sum(CAST(l_extendedprice * (1.0 - l_discount)
        |   AS DECIMAL(38,8))), 2) AS DOUBLE) AS revenue
        |FROM lineitem
        |LEFT JOIN orders ON l_orderkey = o_orderkey
        |LEFT JOIN customer ON o_custkey = c_custkey
        |LEFT JOIN supplier ON l_suppkey = s_suppkey
        |LEFT JOIN nation cn ON c_nationkey = cn.n_nationkey
        |LEFT JOIN nation sn ON s_nationkey = sn.n_nationkey
        |GROUP BY 1, 2""".stripMargin,
    "q8_cast_key_join" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS ev_date, count(*) AS ev_cnt,
        |         round(sum(value), 4) AS ev_value
        |  FROM events GROUP BY 1)
        |SELECT o_orderstatus, count(*) AS cnt,
        |       CAST(sum(coalesce(ev_cnt, 0)) AS BIGINT) AS matched_events
        |FROM orders LEFT JOIN daily ON CAST(o_orderdate AS DATE) = ev_date
        |GROUP BY 1""".stripMargin,
    "q9_projection" ->
      """SELECT l_orderkey AS order_id, CAST(l_linenumber AS BIGINT) AS line_no,
        | l_quantity AS qty,
        | round(l_extendedprice * (1.0 - l_discount), 4) AS revenue,
        | round(l_extendedprice * (1.0 + l_tax), 4) AS gross,
        | l_returnflag || '/' || l_linestatus AS flag_status,
        | CAST(l_shipdate AS DATE) AS ship_date
        |FROM lineitem""".stripMargin,
    "q10_isin_predicate" ->
      """SELECT l_returnflag,
        | CAST(l_linestatus IN ('F') AS BIGINT) AS is_final, count(*) AS cnt
        |FROM lineitem WHERE l_returnflag IN ('A', 'R')
        |GROUP BY 1, 2""".stripMargin,
    "q11_case_canon" ->
      """SELECT CASE
        |  WHEN o_orderpriority LIKE '1%' THEN 'URG'
        |  WHEN o_orderpriority LIKE '2%' THEN 'HIGH'
        |  WHEN o_orderpriority LIKE '3%' THEN 'MED'
        |  WHEN o_orderpriority LIKE '4%' THEN 'NOSPEC'
        |  ELSE 'LOW' END AS prio_canon,
        | count(*) AS cnt,
        | round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,8))) AS DOUBLE)
        |   / count(*), 4) AS avg_price
        |FROM orders GROUP BY 1""".stripMargin,
    "q12_null_defaults" ->
      """SELECT o_orderkey AS order_id,
        | coalesce(nullif(o_orderstatus, 'P'), '') AS status_nn,
        | coalesce(nullif(o_totalprice, o_totalprice), 0.0) AS price_zeroed,
        | coalesce(CASE WHEN o_orderstatus = 'P' THEN o_orderdate END,
        |          TIMESTAMP '1970-01-01 00:00:00') AS date_or_epoch
        |FROM orders""".stripMargin,
    "q13_pad_format" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS nation_id,
        | lpad(n_name, 13, ' ') AS name_lpad,
        | rpad(n_name, 20, '_') AS name_rpad,
        | substring(n_name, 1, 4) AS name_fixed4
        |FROM nation ORDER BY nation_id""".stripMargin,
    "q14_window_topk" ->
      """SELECT prio, rk, order_id, price FROM (
        | SELECT o_orderpriority AS prio,
        |  CAST(row_number() OVER (PARTITION BY o_orderpriority
        |    ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS rk,
        |  o_orderkey AS order_id, o_totalprice AS price
        | FROM orders) WHERE rk <= 3""".stripMargin,
    "q15_set_ops" ->
      """SELECT count(*) AS cnt, count(DISTINCT o_custkey) AS distinct_custs
        |FROM (
        | SELECT o_custkey FROM orders WHERE o_totalprice > 100000.0
        | UNION ALL
        | SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')""".stripMargin,
    "q23_rolling_window" ->
      """SELECT o_orderkey AS order_id,
        | count(*) OVER w AS n_30d,
        | round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,8))) OVER w
        |   AS DOUBLE), 4) AS spend_30d
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
        | RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)""".stripMargin,
    "q24_semi_anti" ->
      """SELECT c_mktsegment AS segment,
        | CAST(sum(CASE WHEN has_o THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_with_orders,
        | CAST(sum(CASE WHEN has_o THEN 0 ELSE 1 END) AS BIGINT)
        |   AS n_no_orders
        |FROM (SELECT c_mktsegment,
        |  EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) AS has_o
        | FROM customer)
        |GROUP BY 1""".stripMargin,
    "q25_intersect_except" ->
      """SELECT
        | (SELECT count(*) FROM (
        |   SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |   INTERSECT
        |   SELECT o_custkey FROM orders WHERE o_totalprice > 100000.0))
        |   AS n_both,
        | (SELECT count(*) FROM (
        |   SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |   EXCEPT
        |   SELECT o_custkey FROM orders WHERE o_totalprice > 100000.0))
        |   AS n_urgent_only""".stripMargin,
  )
}
