package graft.sources

import graft.etl.SnapshotStore
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Stream offset = commit-chain sequence: every snapshot commit claims
  * exactly one chain slot, so the chain IS the change log and an
  * offset names a committed table state. */
case class GraftSeqOffset(seq: Long) extends Offset {
  override def json(): String = seq.toString
}

/** Micro-batch tail of a snapshot table's COMMIT CHAIN — the streaming
  * half of the CDC story (`spark.readStream.format("graft-snapshot")
  * .load(root)`): each new commit publishes one chain slot, and batch
  * (a, b] is the set of data dirs manifest@b lists that manifest@a did
  * not — computed from the two ENDPOINT manifests only, so a consumer
  * that fell behind gets one coalesced batch (intermediate commits are
  * never re-parsed, and their expiry doesn't matter as long as the
  * endpoints are retained; an expired ENDPOINT fails loudly — the
  * Kafka data-loss condition).
  *
  * Emission semantics (document-level contract): appends arrive as the
  * appended rows; a copy-on-write restatement (backfill / MERGE /
  * dynamic overwrite) RE-EMITS the restated partitions wholesale (the
  * new dirs are new — Delta's `ignoreChanges` behavior: consumers that
  * need upsert semantics key on the partition/sort columns); partition
  * DELETEs and [[SnapshotStore.expire]] emit nothing (metadata-only);
  * [[SnapshotStore.compact]] rewrites every partition into fresh dirs
  * and therefore re-emits the whole table — run compaction on tables
  * with live tail consumers deliberately, or key downstream state.
  *
  * 100 TB shape: `latestOffset` is one hint parse + forward exists
  * probes (no listing); batch planning is two ~KB manifest parses + a
  * dir-set diff; the read itself is Spark's own vectorized parquet
  * DSV2 over exactly the new dirs. Offsets/progress live in the normal
  * Spark checkpoint, so restart resumes the tail exactly once per dir.
  *
  * `option("startingSeq", n)` starts the tail AFTER commit n (default
  * 0 = emit the whole current table as the first batch);
  * `option("maxCommitsPerTrigger", k)` bounds admission per batch to
  * k commits (default: all available) — a consumer catching up over a
  * long commit history processes it as bounded increments instead of
  * one giant coalesced batch. */
class GraftSnapshotMicroBatchStream(
    spark: SparkSession,
    root: String,
    pinnedSchema: StructType,
    options: CaseInsensitiveStringMap)
  extends MicroBatchStream with SupportsAdmissionControl
  with SupportsTriggerAvailableNow {

  private val startingSeq: Long =
    Option(options.get("startingSeq")).map(_.toLong).getOrElse(0L)

  // fail at STREAM START, not first batch, when the table cannot be
  // tailed: a table committed in the no-hard-link degraded mode (or a
  // pre-chain legacy table) records sequences in props but has no
  // chain slots to diff — manifestAtSeq names the cause loudly
  locally {
    val head = SnapshotStore.currentSeq(root)
    if (head > 0) SnapshotStore.manifestAtSeq(root, head)
  }

  private val maxCommitsPerTrigger: Option[Long] =
    Option(options.get("maxCommitsPerTrigger")).map { v =>
      val n = v.toLong
      require(n > 0, s"maxCommitsPerTrigger must be positive, got $n")
      n
    }

  override def initialOffset(): Offset = GraftSeqOffset(startingSeq)

  override def latestOffset(): Offset =
    GraftSeqOffset(math.max(startingSeq, SnapshotStore.currentSeq(root)))

  // Trigger.AvailableNow: the head is CAPTURED once at query start and
  // the run drains up to it in (admission-bounded) batches, then stops
  // — without this a capped first batch would end the run early
  private var availableNowBound: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowBound =
      Some(math.max(startingSeq, SnapshotStore.currentSeq(root)))

  // admission control: advance at most maxCommitsPerTrigger chain
  // slots per batch (the head probe is the same one-hint-parse walk)
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[GraftSeqOffset].seq
    val live = math.max(startingSeq, SnapshotStore.currentSeq(root))
    val head = availableNowBound.fold(live)(math.min(live, _))
    GraftSeqOffset(maxCommitsPerTrigger
      .map(k => math.min(head, from + k)).getOrElse(head))
  }

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def reportLatestOffset(): Offset =
    GraftSeqOffset(math.max(startingSeq, SnapshotStore.currentSeq(root)))

  override def deserializeOffset(json: String): Offset =
    GraftSeqOffset(json.trim.toLong)

  override def commit(end: Offset): Unit = () // checkpoint-managed

  override def stop(): Unit = ()

  protected def manifestDirs(seq: Long): Set[String] =
    SnapshotStore.manifestAtSeq(root, seq).entries.map(_.dir).toSet

  private def dirsBetween(a: Long, b: Long): Seq[String] = {
    if (a >= b) return Seq.empty
    val before = manifestDirs(a)
    manifestDirs(b).filterNot(before).toSeq.distinct.sorted
  }

  /** One inner parquet DSV2 scan per micro-batch over exactly the new
    * dirs, pinned to the STREAM's schema (files from later schema
    * evolution read the pinned subset; earlier files read missing
    * columns as null — same contract as the batch reader). */
  protected def parquetBatch(dirs: Seq[String]): Batch = {
    val tbl = ParquetTable(
      s"graft_snapshot_stream_${new java.io.File(root).getName}",
      spark, options, dirs.map(d => s"$root/$d"), Some(pinnedSchema),
      classOf[ParquetFileFormat])
    tbl.newScanBuilder(options).build().toBatch
  }

  // MicroBatchScanExec calls planInputPartitions(start, end) then
  // createReaderFactory() on a fresh exec node each trigger — the
  // factory must come from the scan that planned those partitions
  private var lastBatch: Batch = _

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val dirs = dirsBetween(start.asInstanceOf[GraftSeqOffset].seq,
      end.asInstanceOf[GraftSeqOffset].seq)
    lastBatch = parquetBatch(dirs)
    if (dirs.isEmpty) Array.empty else lastBatch.planInputPartitions()
  }

  override def createReaderFactory(): PartitionReaderFactory =
    lastBatch.createReaderFactory()
}

/** The CHANGE-FEED tail (`readStream.format("graft-snapshot")
  * .option("readChangeFeed", "true")`) — the streaming form of
  * [[SnapshotStore.changeFeed]] (Delta's CDF `readChangeFeed` option):
  * every row carries an appended `_change_type` column. Batch (a, b]
  * emits the ENDPOINT dir diff both directions — manifest@b's new dirs
  * as `insert` rows, manifest@a's removed dirs as `delete` rows — so a
  * copy-on-write restatement reads as delete(old content) +
  * insert(new), a partition DELETE as deletes, an append as inserts:
  * the same contract the batch change feed's oracle pins, now
  * incremental. Offsets, admission control, retention failure modes
  * and the 100 TB shape (two ~KB endpoint parses per batch, vectorized
  * parquet underneath) are inherited from the plain tail; deleted
  * dirs are readable within the retention horizon because both
  * endpoints are retained manifests, whose dirs expire pins. */
class GraftSnapshotCdfMicroBatchStream(
    spark: SparkSession,
    root: String,
    dataSchema: StructType,
    options: CaseInsensitiveStringMap)
  extends GraftSnapshotMicroBatchStream(spark, root, dataSchema, options) {

  private var insertBatch: Batch = _
  private var deleteBatch: Batch = _

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val a = start.asInstanceOf[GraftSeqOffset].seq
    val b = end.asInstanceOf[GraftSeqOffset].seq
    val (ins, del) =
      if (a >= b) (Seq.empty[String], Seq.empty[String])
      else {
        val before = manifestDirs(a)
        val after = manifestDirs(b)
        ((after -- before).toSeq.sorted, (before -- after).toSeq.sorted)
      }
    insertBatch = parquetBatch(ins)
    deleteBatch = parquetBatch(del)
    val ip = if (ins.isEmpty) Array.empty[InputPartition]
      else insertBatch.planInputPartitions()
        .map(p => CdfTaggedPartition(p, insert = true): InputPartition)
    val dp = if (del.isEmpty) Array.empty[InputPartition]
      else deleteBatch.planInputPartitions()
        .map(p => CdfTaggedPartition(p, insert = false): InputPartition)
    ip ++ dp
  }

  override def createReaderFactory(): PartitionReaderFactory =
    CdfTagReaderFactory(insertBatch.createReaderFactory(),
      deleteBatch.createReaderFactory(), dataSchema)
}

/** A parquet input partition tagged with the side of the dir diff it
  * came from (shipped to executors — keep it a flat case class). */
case class CdfTaggedPartition(inner: InputPartition, insert: Boolean)
    extends InputPartition {
  override def preferredLocations(): Array[String] =
    inner.preferredLocations()
}

/** Appends the constant `_change_type` value to every row of the
  * wrapped parquet reader. Row-based on purpose: the tag is one
  * constant column, and forcing the row path keeps the append a
  * JoinedRow + UnsafeProjection instead of a per-batch column splice —
  * CDF consumers process change rows, not scan-bound analytics. */
case class CdfTagReaderFactory(insertFactory: PartitionReaderFactory,
    deleteFactory: PartitionReaderFactory, dataSchema: StructType)
    extends PartitionReaderFactory {

  override def supportColumnarReads(p: InputPartition): Boolean = false

  override def createReader(partition: InputPartition)
      : org.apache.spark.sql.connector.read.PartitionReader[
        org.apache.spark.sql.catalyst.InternalRow] = partition match {
    case CdfTaggedPartition(inner, isInsert) =>
      val r = (if (isInsert) insertFactory else deleteFactory)
        .createReader(inner)
      val tagRow = new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(Array[Any](
          org.apache.spark.unsafe.types.UTF8String.fromString(
            if (isInsert) "insert" else "delete")))
      val out = StructType(dataSchema.fields :+
        org.apache.spark.sql.types.StructField("_change_type",
          org.apache.spark.sql.types.StringType, nullable = false))
      new org.apache.spark.sql.connector.read.PartitionReader[
          org.apache.spark.sql.catalyst.InternalRow] {
        private val joined =
          new org.apache.spark.sql.catalyst.expressions.JoinedRow
        private val proj = org.apache.spark.sql.catalyst.expressions
          .UnsafeProjection.create(out)
        override def next(): Boolean = r.next()
        override def get(): org.apache.spark.sql.catalyst.InternalRow =
          proj(joined(r.get(), tagRow))
        override def close(): Unit = r.close()
      }
    case other => throw new IllegalStateException(
      s"CDF reader factory got an untagged partition: $other")
  }
}
