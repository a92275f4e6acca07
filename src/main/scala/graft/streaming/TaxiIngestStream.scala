package graft.streaming

import graft.etl.{TripsSchemas, TripsTransform}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Incremental staging→analytic ingest as Structured Streaming — the
  * reference's append workflow (its README loads month N+1 by re-running
  * the CSV→staging→INSERT chain, reference README.md:527-596) without
  * re-reading months 1..N:
  *
  *   - the staging directory is a file-stream source; each new gzip CSV
  *     shard dropped in is discovered exactly once (checkpointed source
  *     log), so "load the next month" is just "copy its shards in";
  *   - the same [[TripsTransform]] expression table runs unchanged on
  *     the streaming frame (pure column algebra — no state);
  *   - each micro-batch lands as an atomic SNAPSHOT APPEND commit
  *     ([[graft.etl.SnapshotStore.appendPartitions]]): new month parts
  *     are added to the manifest by one pointer swap, so a reader —
  *     Spark or not — resolves a committed part list and can never see
  *     a half-written batch; the batch id rides along as the
  *     idempotence token, so a batch retried after a crash (commit
  *     landed, checkpoint didn't) is skipped, and the exactly-once
  *     contract no longer depends on the Spark-only `_spark_metadata`
  *     log the earlier file sink used — ingest now shares the table
  *     format the backfill/MERGE paths commit through;
  *   - `Trigger.AvailableNow` drains everything currently staged and
  *     stops — the reference's batch-append semantics — while the same
  *     code with a continuous trigger is the 24/7 tail-ingest mode.
  *
  * At 100 TB: parallelism = staged shard count per trigger
  * (`maxFilesPerTrigger` bounds per-batch memory), the only shuffle is
  * the one month-repartition inside the snapshot write, and the
  * part-per-append layout is the MergeTree insert shape — periodic
  * [[graft.etl.SnapshotStore.compact]] folds parts off the hot path
  * while readers stay on the old manifest.
  */
object TaxiIngestStream {

  /** The staging directory as an unbounded table (same dialect as
    * [[graft.etl.RawCsvSource]]: gzip shards, `\N` nulls). */
  def readStagingStream(spark: SparkSession, dir: String,
      schema: StructType = TripsSchemas.tripsRaw,
      maxFilesPerTrigger: Int = 16): DataFrame =
    spark.readStream
      .schema(schema)
      .option("header", "false")
      .option("nullValue", "\\N")
      .option("emptyValue", null: String)
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
      .option("timestampNTZFormat", "yyyy-MM-dd HH:mm:ss")
      .option("dateFormat", "yyyy-MM-dd")
      .option("mode", "PERMISSIVE")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .option("pathGlobFilter", "*.csv.gz")
      .csv(dir)

  /** Drain currently-staged shards through the transform into the
    * snapshot table at `tableRoot`, one atomic append commit per
    * micro-batch, then stop. Idempotent twice over: the checkpoint
    * skips already-ingested shards across runs, and the batch-id
    * token skips a re-delivered batch whose commit already landed. */
  def ingestAvailable(spark: SparkSession, stagingDir: String,
      tableRoot: String, checkpointDir: String): StreamingQuery =
    ingest(spark, stagingDir, tableRoot, checkpointDir,
      Trigger.AvailableNow())

  /** The 24/7 tail-ingest mode: the SAME pipeline under a processing-
    * time trigger — the query stays up, polls the staging dir every
    * `intervalMs`, and lands each discovered shard batch as its own
    * atomic append commit. Readers resolve committed manifests only
    * (reader isolation is the snapshot layer's, not the trigger's);
    * stopping and re-starting from the same checkpoint resumes the
    * shard log and the per-writer replay token exactly like the
    * drain-and-stop mode. */
  def ingestContinuous(spark: SparkSession, stagingDir: String,
      tableRoot: String, checkpointDir: String,
      intervalMs: Long = 500): StreamingQuery =
    ingest(spark, stagingDir, tableRoot, checkpointDir,
      Trigger.ProcessingTime(intervalMs))

  private def ingest(spark: SparkSession, stagingDir: String,
      tableRoot: String, checkpointDir: String,
      trigger: Trigger): StreamingQuery =
    TripsTransform(readStagingStream(spark, stagingDir))
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // writer id = checkpoint identity: batch ids are only
        // monotonic PER CHECKPOINT, so each pipeline gets its own
        // replay-token slot in the manifest props — a shared slot
        // would let pipeline B's commit erase A's recorded token and
        // A's retried batch would append twice. CANONICALIZED: a
        // restart spelling the same checkpoint differently (relative
        // vs absolute, trailing slash) resumes the same Spark
        // checkpoint, so it must land in the same token slot — a raw
        // string would open a second slot and a batch retried after a
        // commit-landed/checkpoint-lost crash would append twice.
        // Only LOCAL paths canonicalize: java.io.File would mangle a
        // scheme-qualified URI (hdfs://… collapses its "//"), and a
        // URI is already a stable spelling.
        val writerId =
          if (checkpointDir.contains("://")) checkpointDir
          else new java.io.File(checkpointDir).getCanonicalPath
        // migration: a checkpoint that recorded its token under the
        // pre-canonicalization RAW spelling must still be recognized —
        // otherwise the one batch re-delivered across the upgrade
        // (commit landed, checkpoint didn't) would append twice before
        // the canonical slot is first populated. New commits record
        // only the canonical slot, so the alias ages out naturally.
        val legacyIds =
          if (writerId == checkpointDir) Nil else Seq(checkpointDir)
        graft.etl.SnapshotStore.appendPartitions(batch, tableRoot,
          partCol = "pickup_month", sortCol = "pickup_datetime",
          idempotence = Some((writerId, batchId.toString)),
          idempotenceAliases = legacyIds)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
}
