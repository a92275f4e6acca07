package graft.sources

import graft.etl.SnapshotStore
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{LocalScan, ScanBuilder}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import java.util

/** METADATA INSPECTION TABLES — the Iceberg-style `table$kind` suffix
  * views over a snapshot table's own metadata, resolved by
  * [[GraftSnapshotCatalog.loadTable]]:
  *
  * {{{
  * SELECT * FROM snap.`orders$history`     -- commit chain
  * SELECT * FROM snap.`orders$partitions`  -- per-value live rows
  * SELECT * FROM snap.`orders$files`       -- per-entry dirs + DV state
  * SELECT * FROM snap.`orders$refs`        -- tags and branches
  * }}}
  *
  * All four are driver-materialized [[LocalScan]]s over the MANIFEST —
  * O(entries) metadata, never a data-file read, whatever the table
  * size (the operational queries a 100 TB table needs answered in
  * milliseconds: "how big is each partition", "which commits landed
  * today", "is anything still holding a deletion vector"). Row counts
  * come from write-time stats minus DV positions — the same live-row
  * accounting the reads use. Snapshot-consistent: rows are computed
  * from the manifest resolved at load time.
  *
  * (Iceberg ships these as `db.table.history/files/partitions/refs`;
  * Delta as DESCRIBE HISTORY/DETAIL. Reference analogue: ClickHouse's
  * `system.parts` — the operational surface its README leans on for
  * storage introspection.)
  */
private[sources] object GraftMetaTables {

  val Kinds: Set[String] = Set("history", "partitions", "files", "refs")

  def load(root: String, baseName: String, kind: String): Table =
    kind match {
      case "history" => history(root, baseName)
      case "partitions" => partitions(root, baseName)
      case "files" => files(root, baseName)
      case "refs" => refs(root, baseName)
      case other => throw new IllegalArgumentException(
        s"unknown metadata table kind '$$$other' — expected one of " +
          Kinds.toSeq.sorted.mkString(", "))
    }

  private def str(s: String): UTF8String = UTF8String.fromString(s)

  private def history(root: String, base: String): Table = {
    val schema = StructType(Seq(
      StructField("seq", LongType, nullable = false),
      StructField("id", LongType, nullable = false),
      StructField("committed_at", TimestampType, nullable = true),
      StructField("entry_count", IntegerType, nullable = false),
      StructField("live_rows", LongType, nullable = true)))
    new GraftMetaTable(s"$base$$history", schema,
      SnapshotStore.history(root).map { h =>
        InternalRow(h.seq, h.id,
          h.ts.map(ms => java.lang.Long.valueOf(ms * 1000L)).orNull,
          h.entries, h.rows.map(java.lang.Long.valueOf).orNull)
      })
  }

  private def partitions(root: String, base: String): Table = {
    val schema = StructType(Seq(
      StructField("value", StringType, nullable = false),
      StructField("entry_count", IntegerType, nullable = false),
      StructField("live_rows", LongType, nullable = true),
      StructField("dv_rows", LongType, nullable = false)))
    val m = currentOf(root)
    // live equality deletes make per-entry live rows data-dependent —
    // report null rather than an overcount (same honesty as history)
    val eqLive = SnapshotStore.eqDeletesOf(m).nonEmpty
    val rows = m.entries.groupBy(_.value).toSeq.sortBy(_._1).map {
      case (v, es) =>
        val live = es.map(SnapshotStore.liveRows)
        InternalRow(str(v), es.size,
          if (!eqLive && live.forall(_.isDefined))
            java.lang.Long.valueOf(live.flatten.sum)
          else null,
          es.map(_.dv.map(_.rows).getOrElse(0L)).sum)
    }
    new GraftMetaTable(s"$base$$partitions", schema, rows)
  }

  private def files(root: String, base: String): Table = {
    val schema = StructType(Seq(
      StructField("value", StringType, nullable = false),
      StructField("dir", StringType, nullable = false),
      StructField("rows", LongType, nullable = true),
      StructField("live_rows", LongType, nullable = true),
      StructField("dv_rows", LongType, nullable = false),
      StructField("spec", StringType, nullable = true)))
    val m = currentOf(root)
    val eqLive = SnapshotStore.eqDeletesOf(m).nonEmpty
    val rows = m.entries.sortBy(e => (e.value, e.dir)).map { e =>
      InternalRow(str(e.value), str(e.dir),
        e.stats.map(st => java.lang.Long.valueOf(st.rows)).orNull,
        if (eqLive) null
        else SnapshotStore.liveRows(e).map(java.lang.Long.valueOf).orNull,
        e.dv.map(_.rows).getOrElse(0L),
        e.spec.map(str).orNull)
    }
    new GraftMetaTable(s"$base$$files", schema, rows)
  }

  private def refs(root: String, base: String): Table = {
    val schema = StructType(Seq(
      StructField("name", StringType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("snapshot_id", LongType, nullable = false),
      StructField("fork_id", LongType, nullable = true)))
    val tagRows = SnapshotStore.tags(root).toSeq.sortBy(_._1).map {
      case (n, t) => InternalRow(str(n), str("tag"), t.id, null)
    }
    val branchRows = SnapshotStore.branches(root).toSeq.sortBy(_._1)
      .map { case (n, b) =>
        InternalRow(str(n), str("branch"), b.id, b.fork)
      }
    new GraftMetaTable(s"$base$$refs", schema, tagRows ++ branchRows)
  }

  private def currentOf(root: String): SnapshotStore.Manifest =
    SnapshotStore.current(root).getOrElse(
      throw new IllegalStateException(s"no snapshot at $root"))
}

/** A driver-materialized read-only table: the scan IS the rows
  * (planned as a LocalTableScan — no tasks, no files). */
private[sources] class GraftMetaTable(tblName: String,
    tblSchema: StructType, tblRows: Seq[InternalRow])
    extends Table with SupportsRead {

  override def name(): String = tblName
  override def schema(): StructType = tblSchema
  override def capabilities(): util.Set[TableCapability] = {
    val caps = new util.HashSet[TableCapability]()
    caps.add(TableCapability.BATCH_READ)
    caps
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder = () => new LocalScan {
    override def rows(): Array[InternalRow] = tblRows.toArray
    override def readSchema(): StructType = tblSchema
  }
}
