package graft.queries

import graft.Tables
import graft.etl.{CsvExport, MergeTreeWriter, RawCsvSource, TaxiGen, TripsTransform}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference pipeline run END-TO-END on its own schema — the
  * reference's core story (README.md:527-596 load/transform, :606-674
  * benchmark queries), not just the TPC-H analogues:
  *
  *   TaxiGen (51-col raw rows, deterministic from lineitem)
  *     → CsvExport (gzip shards, `\N` nulls — the PG export, S5)
  *     → RawCsvSource (staging read, S1/S2)
  *     → TripsTransform (the CTAS expression table, P2/§2.8)
  *     → MergeTreeWriter (month-partitioned sorted parquet, S4)
  *     → Q1-Q4 (README.md:606-674) + a null-default/enum integrity query.
  *
  * Because the raw rows derive from lineitem by pure column arithmetic,
  * DuckDB replays the same derivation + transform semantics directly on
  * the parquet table, giving every stage of the chain a hash-exact
  * oracle. The chain materializes once per (JVM, sfDir) and the five
  * queries read the resulting MergeTree-analogue table — mirroring the
  * reference, which loads once and benchmarks queries against the
  * loaded table.
  */
object TaxiPipelineQueries {

  type Q = (SparkSession, String) => DataFrame

  private val prepared = scala.collection.mutable.Set[String]()

  /** Run the CSV→staging→transform→MergeTree chain once per JVM+sfDir;
    * returns the analytic-table path. */
  def prepare(s: SparkSession, d: String): String = synchronized {
    // PID-suffixed like the snapshot scratch roots (EtlQueries): the
    // rebuild below is guarded only by this JVM's `prepared` set, so
    // two JVMs sharing java.io.tmpdir (Bench + a plain Verify) would
    // otherwise rebuild/overwrite one root under each other's reads.
    // Built via Fs.processScratchRoot so dead-PID siblings get swept.
    val root = graft.util.Fs.processScratchRoot("taxi",
      s"_${d.hashCode.toHexString}")
    if (!prepared.contains(root)) {
      val raw = TaxiGen.fromLineitem(Tables.lineitem(s, d))
      CsvExport.write(raw, s"$root/staging_csv", shards = 8)
      val staged = RawCsvSource.read(s, s"$root/staging_csv")
      MergeTreeWriter.write(TripsTransform(staged), s"$root/trips_mergetree")
      prepared += root
    }
    s"$root/trips_mergetree"
  }

  private def trips(s: SparkSession, d: String): DataFrame =
    MergeTreeWriter.read(s, prepare(s, d))

  /** Incremental variant of [[prepare]]: the same raw rows arrive as TWO
    * staged drops (the reference's "load month N+1" append,
    * README.md:527-596) drained by [[graft.streaming.TaxiIngestStream]]
    * with one checkpoint — the second drain must pick up only the new
    * shards. Returns the analytic-table path. */
  def prepareStreamed(s: SparkSession, d: String): String = synchronized {
    // PID-suffixed: beyond the rebuild race prepare() documents, this
    // root holds a LIVE snapshot table — a concurrent JVM's wipe would
    // delete MANIFEST and .commit.lock out from under an in-flight
    // append commit
    val root = graft.util.Fs.processScratchRoot("taxistream",
      s"_${d.hashCode.toHexString}")
    if (!prepared.contains(root)) {
      // a previous run's root would make this APPEND onto its
      // already-checkpointed table (each run regenerates shards under
      // fresh names) — start from nothing instead
      graft.util.Fs.deleteRecursively(new java.io.File(root))
      val raw = TaxiGen.fromLineitem(Tables.lineitem(s, d))
      CsvExport.write(raw.filter(pmod(col("trip_id"), lit(2L)) === 0),
        s"$root/drop1", shards = 4)
      CsvExport.write(raw.filter(pmod(col("trip_id"), lit(2L)) =!= 0),
        s"$root/drop2", shards = 4)
      def stage(drop: String): Unit = {
        val dst = new java.io.File(s"$root/staging")
        dst.mkdirs()
        new java.io.File(s"$root/$drop").listFiles()
          .filter(_.getName.endsWith(".csv.gz"))
          .foreach { f =>
            java.nio.file.Files.copy(f.toPath,
              new java.io.File(dst, f.getName).toPath)
          }
        graft.streaming.TaxiIngestStream.ingestAvailable(s,
          s"$root/staging", s"$root/table", s"$root/ckpt")
          .awaitTermination()
      }
      stage("drop1")
      stage("drop2")
      prepared += root
    }
    s"$root/table"
  }

  /** Reference Q1 (README.md:606): cab_type counts. */
  def q1: Q = (s, d) =>
    trips(s, d).groupBy("cab_type").agg(count(lit(1)).as("cnt"))

  /** Reference Q2 (README.md:626): avg(total_amount) by passenger_count.
    * total_amount is whole-valued by construction, so the average is one
    * exact-integer sum ÷ count — a single IEEE division that is
    * bit-identical across engines, with no rounding step to tie-break. */
  def q2: Q = (s, d) =>
    trips(s, d)
      .groupBy(col("passenger_count").cast("long").as("pax"))
      .agg((sum(col("total_amount").cast("long")).cast("double")
        / count(lit(1))).as("avg_amount"))

  /** Reference Q3 (README.md:646-648): passenger_count × trip year. */
  def q3: Q = (s, d) =>
    trips(s, d)
      .groupBy(col("passenger_count").cast("long").as("pax"),
        year(col("pickup_date")).cast("long").as("yr"))
      .agg(count(lit(1)).as("cnt"))

  /** Reference Q4 (README.md:670-674): 3 keys, two derived, ordered by
    * (year, count DESC). */
  def q4: Q = (s, d) =>
    trips(s, d)
      .groupBy(col("passenger_count").cast("long").as("pax"),
        year(col("pickup_date")).cast("long").as("yr"),
        round(col("trip_distance"), 0).as("dist"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("yr").asc, col("cnt").desc)

  /** Integrity of the transform's null-default/enum/IN-as-value
    * semantics after the full chain: per canonical payment type, row
    * count, stored store_and_fwd 0/1 sum, and epoch-0 dropoff count
    * (the toDateTime(0) default, README.md:553-555). */
  def canon: Q = (s, d) =>
    trips(s, d)
      .groupBy(col("payment_type_").as("pay"))
      .agg(
        count(lit(1)).as("cnt"),
        sum(col("store_and_fwd_flag").cast("long")).as("n_sf"),
        sum(when(col("dropoff_datetime") ===
          to_timestamp(lit("1970-01-01 00:00:00")), 1L).otherwise(0L))
          .as("n_epoch_dropoff"))

  /** Trip quality control — the data-cleaning query every taxi analysis
    * starts with (impossible durations, physically impossible speeds):
    * per cab type, the trip count, trips whose dropoff does not follow
    * their pickup (the epoch-0 default rows land here — a QC view of
    * the toDateTime(0) semantics), trips over 80 mph, and the mean
    * speed of the valid rest. Speed is distance·3600/duration in the
    * same IEEE doubles on both engines (duration is exact integer
    * seconds by construction), per-row speeds round to 6 dp and sum in
    * decimal so the mean is partition-order-free. One scan, one
    * 3-row-per-partition shuffle. */
  def speedQc: Q = (s, d) => {
    // dur_s is WHOLE seconds by construction — each timestamp floors
    // to its second before subtracting, the exact semantics of the
    // oracle's date_diff('second', …) (date_trunc both ends, then
    // diff). The former single double-division of the micros delta
    // agreed only because the fixture emits whole-second timestamps;
    // this form agrees at any timestamp precision. (floor of
    // micros/1e6 is exact in doubles: micros < 2^53 and the quotient
    // is ≥ 1e-6 below the next integer, outside half-ulp.)
    def wholeSecs(c: org.apache.spark.sql.Column) =
      floor(unix_micros(c) / lit(1000000L)).cast("long")
    val t = trips(s, d).select(col("cab_type"),
      (wholeSecs(col("dropoff_datetime")) -
        wholeSecs(col("pickup_datetime"))).as("dur_s"),
      col("trip_distance"))
    val speed = col("trip_distance") * lit(3600.0) / col("dur_s")
    t.groupBy("cab_type").agg(
      count(lit(1)).as("n_trips"),
      sum(when(col("dur_s") <= 0, 1L).otherwise(0L)).as("n_invalid"),
      sum(when(col("dur_s") > 0 && speed > 80.0, 1L).otherwise(0L))
        .as("n_speeding"),
      round(sum(when(col("dur_s") > 0,
        round(speed, 6).cast("decimal(38,8)"))
        .otherwise(lit(0).cast("decimal(38,8)"))).cast("double") /
        sum(when(col("dur_s") > 0, 1L).otherwise(0L)), 4)
        .as("avg_speed_mph"))
  }

  /** Reference Q1 over the STREAM-ingested table: the incremental
    * two-drop ingest must agree with the batch derivation exactly, so
    * it shares taxi_e2e_q1's oracle. */
  def q1Streamed: Q = (s, d) =>
    graft.etl.SnapshotStore.read(s, prepareStreamed(s, d))
      .groupBy("cab_type").agg(count(lit(1)).as("cnt"))

  /** Reference Q1 over the COMPACTED stream-ingested table: compaction
    * (the background-merge analogue) must preserve content exactly, so
    * it shares taxi_e2e_q1's oracle. */
  def q1Compacted: Q = (s, d) => {
    val src = prepareStreamed(s, d)
    // in-place snapshot compaction: per-batch parts fold to one sorted
    // dir per month behind a pointer swap — readers on the pre-compact
    // manifest are untouched, unlike a file-level rewrite
    synchronized {
      if (!prepared.contains(s"$src#compacted")) {
        graft.etl.SnapshotStore.compact(s, src,
          partCol = "pickup_month", sortCol = "pickup_datetime")
        prepared += s"$src#compacted"
      }
    }
    graft.etl.SnapshotStore.read(s, src)
      .groupBy("cab_type").agg(count(lit(1)).as("cnt"))
  }

  /** The reference's benchmark queries as SQL TEXT through `spark.sql`
    * over a `trips_mergetree` temp view — the literal user experience
    * of the reference (clickhouse-client --query=..., README.md:612),
    * not a DSL re-expression. Dialect normalization is confined to:
    * `toYear(d)` → `year(d)` (the one ClickHouse-ism), plus output
    * aliases/casts so the SQL lanes share the DSL lanes' oracles
    * column-for-column (the driver hashes by column name). Each SQL
    * lane must hash-match the same oracle as its DSL twin — two
    * front-ends, one plan contract. */
  private def sqlOnTrips(text: String): Q = (s, d) => {
    trips(s, d).createOrReplaceTempView("trips_mergetree")
    s.sql(text)
  }

  /** README.md:606 verbatim modulo the output alias. */
  def sqlQ1: Q = sqlOnTrips(
    "SELECT cab_type, count(*) AS cnt FROM trips_mergetree GROUP BY cab_type")

  /** README.md:626; avg expanded to the exact-integer-sum ÷ count form
    * the DSL lane uses (total_amount is whole-valued by construction,
    * so this IS avg(total_amount), bit-exact across engines). */
  def sqlQ2: Q = sqlOnTrips(
    """SELECT CAST(passenger_count AS BIGINT) AS pax,
      | CAST(SUM(CAST(total_amount AS BIGINT)) AS DOUBLE) / count(*)
      |   AS avg_amount
      |FROM trips_mergetree GROUP BY passenger_count""".stripMargin)

  /** README.md:646-648; toYear → year. */
  def sqlQ3: Q = sqlOnTrips(
    """SELECT CAST(passenger_count AS BIGINT) AS pax,
      | CAST(year(pickup_date) AS BIGINT) AS yr, count(*) AS cnt
      |FROM trips_mergetree GROUP BY passenger_count, yr""".stripMargin)

  /** README.md:670-674; toYear → year, ORDER BY year, count(*) DESC. */
  def sqlQ4: Q = sqlOnTrips(
    """SELECT CAST(passenger_count AS BIGINT) AS pax,
      | CAST(year(pickup_date) AS BIGINT) AS yr,
      | round(trip_distance) AS dist, count(*) AS cnt
      |FROM trips_mergetree
      |GROUP BY passenger_count, yr, dist
      |ORDER BY yr, cnt DESC""".stripMargin)

  val queries: Map[String, Q] = Map(
    "taxi_e2e_q1" -> q1,
    "taxi_e2e_q2" -> q2,
    "taxi_e2e_q3" -> q3,
    "taxi_e2e_q4" -> q4,
    "taxi_e2e_canon" -> canon,
    "taxi_stream_ingest" -> q1Streamed,
    "taxi_compacted_q1" -> q1Compacted,
    "taxi_sql_q1" -> sqlQ1,
    "taxi_sql_q2" -> sqlQ2,
    "taxi_sql_q3" -> sqlQ3,
    "taxi_sql_q4" -> sqlQ4,
    "taxi_speed_qc" -> speedQc,
  )

  /** DuckDB replay of TaxiGen + TripsTransform for the oracled columns:
    * same derivation, same null injections, same defaults. */
  private val derive: String =
    """WITH raw AS (
      |  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
      |   CASE CAST(l_orderkey % 3 AS INT) WHEN 0 THEN 'yellow'
      |        WHEN 1 THEN 'green' ELSE 'uber' END AS cab_type,
      |   CASE WHEN l_partkey % 7 = 0 THEN NULL
      |        ELSE l_partkey % 6 + 1 END AS passenger_count,
      |   CAST(round(l_extendedprice) AS FLOAT) AS total_amount,
      |   l_shipdate + to_seconds(CAST(l_partkey % 86400 AS BIGINT))
      |     AS pickup_datetime,
      |   CASE WHEN (l_orderkey + l_linenumber) % 10 = 0 THEN NULL
      |        ELSE l_shipdate + to_seconds(CAST(l_partkey % 86400
      |          + l_suppkey % 7200 + 60 AS BIGINT)) END AS dropoff_datetime,
      |   CASE WHEN l_orderkey % 11 = 0 THEN NULL
      |        ELSE l_quantity / 4.0 END AS trip_distance,
      |   (['CSH','CASH','Cash','CAS','Cas','1','CRD','Credit','Cre','CRE',
      |     'CREDIT','2','NOC','No Charge','No','3','DIS','Dispute','Dis',
      |     '4','XXX'])[CAST(l_partkey % 21 AS INT) + 1] AS payment_type,
      |   (['Y','N','1','2',NULL])[CAST(l_orderkey % 5 AS INT) + 1]
      |     AS store_and_fwd_flag
      |  FROM lineitem),
      | trips AS (
      |  SELECT cab_type,
      |   CAST(coalesce(passenger_count, 0) AS BIGINT) AS pax,
      |   total_amount,
      |   CAST(pickup_datetime AS DATE) AS pickup_date,
      |   coalesce(dropoff_datetime, TIMESTAMP '1970-01-01 00:00:00')
      |     AS dropoff_datetime,
      |   coalesce(trip_distance, 0.0) AS trip_distance,
      |   CASE WHEN payment_type IN ('CSH','CASH','Cash','CAS','Cas','1')
      |          THEN 'CSH'
      |        WHEN payment_type IN ('CRD','Credit','Cre','CRE','CREDIT','2')
      |          THEN 'CRE'
      |        WHEN payment_type IN ('NOC','No Charge','No','3') THEN 'NOC'
      |        WHEN payment_type IN ('DIS','Dispute','Dis','4') THEN 'DIS'
      |        ELSE 'UNK' END AS payment_type_,
      |   CASE WHEN store_and_fwd_flag IN ('Y','1','2') THEN 1 ELSE 0 END
      |     AS sf_flag
      |  FROM raw)
      |""".stripMargin

  val oracle: Map[String, String] = Map(
    // QC replay on the raw derivation: duration = exact integer
    // seconds (epoch-0 defaults go negative → invalid), speed in the
    // same IEEE doubles, 6-dp per-row rounding + decimal sum
    "taxi_speed_qc" -> (derive +
      """, qc AS (SELECT cab_type,
        |  date_diff('second', pickup_datetime,
        |    coalesce(dropoff_datetime, TIMESTAMP '1970-01-01 00:00:00'))
        |    AS dur_s,
        |  coalesce(trip_distance, 0.0) AS dist
        | FROM raw)
        |SELECT cab_type, count(*) AS n_trips,
        | CAST(sum(CASE WHEN dur_s <= 0 THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_invalid,
        | CAST(sum(CASE WHEN dur_s > 0 AND dist * 3600.0 / dur_s > 80.0
        |   THEN 1 ELSE 0 END) AS BIGINT) AS n_speeding,
        | round(CAST(sum(CASE WHEN dur_s > 0
        |     THEN CAST(round(dist * 3600.0 / dur_s, 6) AS DECIMAL(38,8))
        |     ELSE CAST(0 AS DECIMAL(38,8)) END) AS DOUBLE)
        |   / sum(CASE WHEN dur_s > 0 THEN 1 ELSE 0 END), 4)
        |   AS avg_speed_mph
        |FROM qc GROUP BY 1""".stripMargin),
    "taxi_e2e_q1" -> (derive +
      "SELECT cab_type, count(*) AS cnt FROM trips GROUP BY 1"),
    // SQL-text front-end lanes share the DSL lanes' oracles verbatim:
    // two front-ends, one result contract
    "taxi_sql_q1" -> (derive +
      "SELECT cab_type, count(*) AS cnt FROM trips GROUP BY 1"),
    "taxi_sql_q2" -> (derive +
      """SELECT pax,
        | CAST(CAST(sum(CAST(total_amount AS BIGINT)) AS BIGINT) AS DOUBLE)
        |   / count(*) AS avg_amount
        |FROM trips GROUP BY 1""".stripMargin),
    "taxi_sql_q3" -> (derive +
      """SELECT pax, year(pickup_date) AS yr, count(*) AS cnt
        |FROM trips GROUP BY 1, 2""".stripMargin),
    "taxi_sql_q4" -> (derive +
      """SELECT pax, year(pickup_date) AS yr, round(trip_distance) AS dist,
        | count(*) AS cnt
        |FROM trips GROUP BY 1, 2, 3 ORDER BY yr, cnt DESC""".stripMargin),
    "taxi_stream_ingest" -> (derive +
      "SELECT cab_type, count(*) AS cnt FROM trips GROUP BY 1"),
    "taxi_compacted_q1" -> (derive +
      "SELECT cab_type, count(*) AS cnt FROM trips GROUP BY 1"),
    "taxi_e2e_q2" -> (derive +
      """SELECT pax,
        | CAST(CAST(sum(CAST(total_amount AS BIGINT)) AS BIGINT) AS DOUBLE)
        |   / count(*) AS avg_amount
        |FROM trips GROUP BY 1""".stripMargin),
    "taxi_e2e_q3" -> (derive +
      """SELECT pax, year(pickup_date) AS yr, count(*) AS cnt
        |FROM trips GROUP BY 1, 2""".stripMargin),
    "taxi_e2e_q4" -> (derive +
      """SELECT pax, year(pickup_date) AS yr, round(trip_distance) AS dist,
        | count(*) AS cnt
        |FROM trips GROUP BY 1, 2, 3 ORDER BY yr, cnt DESC""".stripMargin),
    "taxi_e2e_canon" -> (derive +
      """SELECT payment_type_ AS pay, count(*) AS cnt,
        | CAST(sum(sf_flag) AS BIGINT) AS n_sf,
        | CAST(sum(CASE WHEN dropoff_datetime =
        |   TIMESTAMP '1970-01-01 00:00:00' THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_epoch_dropoff
        |FROM trips GROUP BY 1""".stripMargin),
  )
}
