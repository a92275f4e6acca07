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
  * `option("startingTimestamp", t)` (epoch millis or
  * `yyyy-MM-dd HH:mm:ss[.SSS]` UTC) addresses the same bound by commit
  * WALL TIME — the tail emits commits stamped strictly after t, so a
  * consumer that snapshotted `TIMESTAMP AS OF t` resumes exactly
  * where it left off; `option("maxCommitsPerTrigger", k)` bounds
  * admission per batch to k commits (default: all available) — a
  * consumer catching up over a long commit history processes it as
  * bounded increments instead of one giant coalesced batch. */
class GraftSnapshotMicroBatchStream(
    spark: SparkSession,
    root: String,
    pinnedSchema: StructType,
    options: CaseInsensitiveStringMap)
  extends MicroBatchStream with SupportsAdmissionControl
  with SupportsTriggerAvailableNow {

  private val startingSeq: Long = {
    require(!(options.containsKey("startingSeq") &&
        options.containsKey("startingTimestamp")),
      "give startingSeq OR startingTimestamp, not both")
    Option(options.get("startingSeq")).map(_.toLong)
      .orElse(Option(options.get("startingTimestamp"))
        .map(GraftSeqBounds.seqAtOrBefore(root, _, "startingTimestamp")))
      .getOrElse(0L)
  }

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
  protected def parquetBatch(dirs: Seq[String]): Batch =
    parquetBatch(dirs, pinnedSchema)

  /** Same, under an explicit schema (the CDF tail reads sidecar dirs
    * whose files carry `_change_type` as a real column). */
  protected def parquetBatch(dirs: Seq[String],
      schema: StructType): Batch = {
    val tbl = ParquetTable(
      s"graft_snapshot_stream_${new java.io.File(root).getName}",
      spark, options, dirs.map(d => s"$root/$d"), Some(schema),
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
  * is replayed PER COMMIT, exactly like the batch feed: a DML commit
  * (row-level UPDATE/DELETE, MERGE) emits its row-exact CDC sidecar
  * (`update_preimage`/`update_postimage`/`delete`/`insert` rows
  * persisted at commit time), a compaction emits nothing (empty
  * sidecar = no row changed), and any other commit emits its dir
  * diff — new dirs as `insert` rows, dropped dirs as `delete` rows —
  * so an append is exactly the appended rows, a backfill/rollback is
  * delete(old content) + insert(new), a partition DELETE deletes only.
  * A lagging consumer's coalesced batch carries the UNION of its
  * commits' changes (per-commit replay — intermediate changes are
  * never dropped); only if an INTERMEDIATE commit was expired does the
  * batch fall back to the endpoint-wholesale dir diff (net-correct,
  * WARNed). Offsets, admission control, retention failure modes and
  * the 100 TB shape (one ~KB manifest parse per commit in the batch,
  * vectorized parquet underneath) are inherited from the plain tail;
  * deleted dirs and sidecars are readable within the retention horizon
  * because retention pins retained manifests' dirs. */
class GraftSnapshotCdfMicroBatchStream(
    spark: SparkSession,
    root: String,
    dataSchema: StructType,
    options: CaseInsensitiveStringMap)
  extends GraftSnapshotMicroBatchStream(spark, root, dataSchema, options) {

  private val cdfSchema = StructType(dataSchema.fields :+
    org.apache.spark.sql.types.StructField("_change_type",
      org.apache.spark.sql.types.StringType))

  /** The planned scan segments of the last batch: one inner parquet
    * Batch per segment, plus the constant tag to append (None for
    * sidecar segments — their files carry `_change_type` natively). */
  private var segments: Seq[(Batch, Option[String])] = Seq.empty

  /** One segment per change source in (a, b]: per-commit sidecar/diff
    * segments, or the endpoint-wholesale fallback when an intermediate
    * slot was expired. */
  private def planSegments(a: Long, b: Long)
      : Seq[(Seq[String], Option[String])] = {
    if (a >= b) return Seq.empty
    def manifestOf(seq: Long): SnapshotStore.Manifest =
      SnapshotStore.manifestAtSeq(root, seq)
    def dvOf(m: SnapshotStore.Manifest): Map[String, Option[_]] =
      m.entries.map(e => e.dir -> e.dv).toMap
    // endpoints resolve LOUDLY (falling past retention is data loss)
    val mA = if (a == 0) SnapshotStore.Manifest(0L, Seq.empty)
      else manifestOf(a)
    val mB = manifestOf(b)
    val perCommit: Option[Seq[(Seq[String], Option[String])]] =
      try {
        var prevM = mA
        Some((a + 1 to b).flatMap { s =>
          val m = manifestOf(s)
          val prev = prevM.entries.map(_.dir).toSet
          val cur = m.entries.map(_.dir).toSet
          val segs =
            if (java.nio.file.Files.isDirectory(
                SnapshotStore.cdcDirOf(root, m.id)))
              Seq((Seq(s"data/snap-${m.id}/${SnapshotStore.CdcDirName}"),
                None))
            else {
              // a sidecar-less step whose deletion vectors CHANGED on
              // dirs it kept (a rollback across DV commits) cannot be
              // expressed as a raw dir diff — the stream reads files
              // positionally and cannot anti-apply vectors. Refuse
              // loudly; the batch changeFeed handles this shape.
              val dvPrev = dvOf(prevM); val dvCur = dvOf(m)
              val dvChanged = (prev intersect cur).exists(d =>
                dvPrev.get(d) != dvCur.get(d))
              if (dvChanged) throw new UnsupportedOperationException(
                s"CDF tail at $root: commit seq $s changed deletion " +
                  "vectors on carried dirs without a CDC sidecar (a " +
                  "rollback across DV commits) — the streaming tail " +
                  "cannot replay it; use the batch changeFeed for " +
                  "this range and restart the stream from its head")
              Seq(((cur -- prev).toSeq.sorted, Some("insert")),
                ((prev -- cur).toSeq.sorted, Some("delete")))
            }
          prevM = m
          segs.filter(_._1.nonEmpty)
        })
      } catch {
        case e: IllegalStateException =>
          System.err.println(
            s"[snapshot] WARN: CDF batch ($a, $b] at $root cannot " +
              s"replay per-commit (${e.getMessage}) — emitting the " +
              "endpoint-wholesale dir diff instead; changes that " +
              "cancelled out within the batch are coalesced away")
          None
      }
    perCommit.getOrElse {
      // the wholesale fallback reads raw dirs — with live deletion
      // vectors at either endpoint that read would leak deleted rows
      // (or miss DV-only diffs); fail loudly rather than emit a wrong
      // feed (the batch changeFeed's entry-based diff handles DVs)
      if (mA.entries.exists(_.dv.isDefined) ||
          mB.entries.exists(_.dv.isDefined))
        throw new UnsupportedOperationException(
          s"CDF tail at $root: per-commit replay is unavailable for " +
            s"($a, $b] and an endpoint carries deletion vectors — the " +
            "wholesale dir-diff fallback cannot anti-apply them; " +
            "raise retention, or read the range with the batch " +
            "changeFeed")
      val aDirs = mA.entries.map(_.dir).toSet
      val bDirs = mB.entries.map(_.dir).toSet
      Seq(((bDirs -- aDirs).toSeq.sorted, Some("insert")),
        ((aDirs -- bDirs).toSeq.sorted, Some("delete")))
        .filter(_._1.nonEmpty)
    }
  }

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val a = start.asInstanceOf[GraftSeqOffset].seq
    val b = end.asInstanceOf[GraftSeqOffset].seq
    segments = planSegments(a, b).map { case (dirs, tag) =>
      // sidecar files carry _change_type as a real column — read them
      // under the full CDF schema, no tagging; diff segments read the
      // data schema and get the constant tag appended per row
      (parquetBatch(dirs, if (tag.isEmpty) cdfSchema else dataSchema),
        tag)
    }
    segments.zipWithIndex.flatMap { case ((batch, tag), i) =>
      batch.planInputPartitions()
        .map(p => CdfPartition(p, i, tag.orNull): InputPartition)
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    CdfReaderFactory(segments.map(_._1.createReaderFactory()), dataSchema)
}

/** A parquet input partition of one CDF segment: `segment` indexes the
  * planning stream's segment list (to pick the right inner factory),
  * `tag` is the constant `_change_type` to append — null for sidecar
  * partitions, whose rows carry it natively (shipped to executors —
  * keep it a flat case class). */
case class CdfPartition(inner: InputPartition, segment: Int, tag: String)
    extends InputPartition {
  override def preferredLocations(): Array[String] =
    inner.preferredLocations()
}

/** Appends the partition's constant `_change_type` value to every row
  * of the wrapped parquet reader (sidecar partitions pass through —
  * their read schema already ends in `_change_type`). Row-based on
  * purpose: the tag is one constant column, and forcing the row path
  * keeps the append a JoinedRow + UnsafeProjection instead of a
  * per-batch column splice — CDF consumers process change rows, not
  * scan-bound analytics. */
case class CdfReaderFactory(factories: Seq[PartitionReaderFactory],
    dataSchema: StructType) extends PartitionReaderFactory {

  override def supportColumnarReads(p: InputPartition): Boolean = false

  override def createReader(partition: InputPartition)
      : org.apache.spark.sql.connector.read.PartitionReader[
        org.apache.spark.sql.catalyst.InternalRow] = partition match {
    case CdfPartition(inner, segment, tag) =>
      val r = factories(segment).createReader(inner)
      if (tag == null) r // sidecar rows already carry _change_type
      else {
        val tagRow = new org.apache.spark.sql.catalyst.expressions
          .GenericInternalRow(Array[Any](
            org.apache.spark.unsafe.types.UTF8String.fromString(tag)))
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
      }
    case other => throw new IllegalStateException(
      s"CDF reader factory got an untagged partition: $other")
  }
}
