package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Bucketed (hash-clustered, sorted) table layout for shuffle-free
  * fact⋈fact joins — the scale path the MergeTree analogue
  * ([[MergeTreeWriter]]) does not cover.
  *
  * The reference joins its fact table only against fixed-size dims
  * (reference README.md:311-365 denormalization), which broadcast. A
  * 100 TB deployment also needs fact⋈fact joins (lineitem⋈orders
  * class), where the naive plan shuffles BOTH sides on every query.
  * Bucketing pays that shuffle once at write time:
  *
  *   - `bucketBy(n, key)` hash-clusters rows into `n` buckets with the
  *     same murmur3 `HashPartitioning` the join would shuffle to, so a
  *     join of two tables bucketed on their join keys (same `n`)
  *     satisfies both children's required distribution with ZERO
  *     exchanges;
  *   - `sortBy(key)` + one-file-per-bucket (guaranteed by the
  *     `repartition(n, key)` below — the write tasks are already laid
  *     out in bucket order) lets sort-merge join skip its per-side Sort
  *     as well: the join degenerates to a streaming zip of pre-sorted
  *     files;
  *   - repeated joins (every query in a dashboard workload) amortize
  *     the single write-time shuffle.
  *
  * At 100 TB choose `buckets` so each bucket is a few hundred MB
  * (e.g. 4096); tests use small counts. The spark-native bucketed
  * layout is the analogue of ClickHouse's co-located sharding key.
  */
object BucketedTables {

  /** Write `df` as a bucketed+sorted external table at `path`.
    * The `repartition(buckets, key)` uses the SAME HashPartitioning
    * expression bucketing uses, so each write task holds exactly one
    * bucket → exactly one file per bucket → sorted-scan eligibility. */
  def write(df: DataFrame, table: String, path: String, key: String,
      buckets: Int): Unit = {
    val s = df.sparkSession
    s.sql(s"DROP TABLE IF EXISTS $table")
    df.repartition(buckets, col(key))
      .write
      .mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
  }

  /** Join two bucketed tables on their bucket keys, forcing sort-merge
    * (`hint("merge")`) so the plan shape is scale-invariant: at 100 TB
    * neither side fits a broadcast, and with aligned buckets the SMJ
    * needs no exchange and no sort. */
  def cogroupJoin(s: SparkSession, left: String, right: String,
      leftKey: String, rightKey: String): DataFrame = {
    // Bucket sort metadata is only propagated to the scan's
    // outputOrdering behind this flag (off by default since Spark 3.1,
    // SPARK-32859, because multi-file buckets are merely locally
    // sorted). Our writer guarantees one file per bucket, which is
    // exactly the case the flag's one-file-per-bucket check requires,
    // so the SMJ consumes the files with no Sort at all.
    s.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    s.table(left).hint("merge")
      .join(s.table(right), col(leftKey) === col(rightKey))
  }
}
