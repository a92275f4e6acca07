package graft.sources

import java.util

import graft.etl.SnapshotStore
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.NoSuchTableException
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Pure-SQL read path for [[SnapshotStore]] tables — the gap that made
  * the table format Scala-API-only: a snapshot table was readable via
  * `SnapshotStore.read` but invisible to `spark.sql`. Two entry points,
  * both resolving the manifest POINTER once at table-load time and then
  * handing Spark's own parquet DSV2 machinery ([[ParquetTable]]) the
  * exact dir list + manifest schema — so predicate pushdown, column
  * pruning, vectorized reads and AQE all apply unchanged, and the
  * snapshot isolation contract is preserved (the planned scan can never
  * mix two commits, because the dir list was fixed at a single pointer
  * resolve):
  *
  * {{{
  * // 1. reader format (option-addressed, time-travel via asOf):
  * spark.read.format("graft-snapshot")
  *   .option("asOf", 1).load(root)
  * // 2. catalog (name-addressed, SQL time travel):
  * spark.conf.set("spark.sql.catalog.snap",
  *   classOf[GraftSnapshotCatalog].getName)
  * spark.conf.set("spark.sql.catalog.snap.warehouse", dir)
  * spark.sql("SELECT * FROM snap.my_table VERSION AS OF 1")
  * }}}
  *
  * 100 TB shape: table load cost is one ~KB manifest read; no file
  * listing happens until Spark plans the scan over exactly the listed
  * dirs, and manifest-level partition pruning remains available on the
  * Scala path ([[SnapshotStore.readWhere]]) while file-level pruning
  * (pushed filters, row-group stats) applies on both.
  *
  * Writes stay on the transactional Scala API
  * ([[SnapshotStore.write]]/[[graft.operators.MergeInto.mergeCommit]]);
  * the catalog is deliberately read-only — an INSERT bypassing the
  * commit lock would break the single-writer discipline.
  */
object GraftSnapshotTables {

  /** A loaded snapshot as Spark's own parquet DSV2 table: the manifest
    * schema (if carried) becomes the user-specified schema, so
    * pre-evolution dirs read evolved columns as null — same contract
    * as [[SnapshotStore.read]]. */
  def load(spark: SparkSession, root: String, asOf: Option[Long],
      options: CaseInsensitiveStringMap): ParquetTable = {
    val m = asOf.map(SnapshotStore.manifestAt(root, _))
      .orElse(SnapshotStore.current(root))
      .getOrElse(throw new IllegalStateException(s"no snapshot at $root"))
    // zero entries is legal (a MERGE whose deletes drained every
    // partition): ParquetTable over an empty dir list plans an empty
    // scan under the manifest schema — only a schema-less pre-evolution
    // manifest cannot type it
    require(m.entries.nonEmpty || m.schema.isDefined,
      s"snapshot ${m.id} at $root lists no data and carries no schema " +
        "— cannot type the empty table")
    ParquetTable(
      s"graft_snapshot_${new java.io.File(root).getName}@${m.id}",
      spark,
      options,
      m.entries.map(e => s"$root/${e.dir}"),
      m.schema,
      classOf[ParquetFileFormat])
  }
}

/** `spark.read.format("graft-snapshot")` — option-addressed reader.
  * `load(path)` (or `.option("path", …)`) names the table root;
  * `.option("asOf", id)` time-travels to a retained manifest. */
class GraftSnapshotProvider extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-snapshot"

  /** One resolve per (provider instance, options): Spark calls
    * inferSchema then getTable with the same option map on one
    * instance — without the memo the manifest would be parsed twice,
    * and a commit racing between the two calls could resolve two
    * DIFFERENT snapshots for one load (the "pointer resolved once"
    * contract). CaseInsensitiveStringMap equality is entry-set
    * equality, so a same-options re-call reuses the table. */
  private var cachedKey: CaseInsensitiveStringMap = _
  private var cachedTable: ParquetTable = _

  private def resolve(options: CaseInsensitiveStringMap): ParquetTable =
    synchronized {
      if (cachedKey == null || cachedKey != options) {
        val root = Option(options.get("path")).getOrElse(
          throw new IllegalArgumentException(
            "graft-snapshot needs a table root: .load(root) or " +
              ".option(\"path\", root)"))
        val asOf = Option(options.get("asOf")).map(_.toLong)
        cachedTable =
          GraftSnapshotTables.load(SparkSession.active, root, asOf, options)
        cachedKey = options
      }
      cachedTable
    }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    resolve(options).schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    resolve(new CaseInsensitiveStringMap(properties))
}

/** A read-only [[TableCatalog]] over a warehouse directory of snapshot
  * roots: table `snap.t` resolves to `<warehouse>/t` (namespaces map to
  * subdirectories), `VERSION AS OF n` loads retained manifest `n`.
  * Mutations are rejected — commits go through the locked Scala API. */
class GraftSnapshotCatalog extends TableCatalog {

  private var catalogName: String = _
  private var warehouse: String = _

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"spark.sql.catalog.$name.warehouse must point at a directory " +
          "of snapshot table roots"))
  }

  override def name(): String = catalogName

  private def rootOf(ident: Identifier): String =
    (warehouse +: (ident.namespace() :+ ident.name())).mkString("/")

  private def tableExistsAt(root: String): Boolean =
    new java.io.File(s"$root/MANIFEST").isFile

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = new java.io.File((warehouse +: namespace).mkString("/"))
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && tableExistsAt(f.toString))
      .map(f => Identifier.of(namespace, f.getName))
  }

  override def loadTable(ident: Identifier): Table = {
    val root = rootOf(ident)
    if (!tableExistsAt(root)) throw new NoSuchTableException(ident)
    GraftSnapshotTables.load(SparkSession.active, root, None,
      CaseInsensitiveStringMap.empty())
  }

  /** SQL time travel: `VERSION AS OF n` arrives here as a string. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val root = rootOf(ident)
    if (!tableExistsAt(root)) throw new NoSuchTableException(ident)
    val id = version.toLongOption.getOrElse(
      throw new IllegalArgumentException(
        s"snapshot version must be a manifest id, got '$version'"))
    GraftSnapshotTables.load(SparkSession.active, root, Some(id),
      CaseInsensitiveStringMap.empty())
  }

  override def tableExists(ident: Identifier): Boolean =
    tableExistsAt(rootOf(ident))

  private def readOnly: Nothing = throw new UnsupportedOperationException(
    "graft snapshot catalog is read-only: write through " +
      "SnapshotStore / MergeInto.mergeCommit (the locked commit path)")

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = readOnly
  override def alterTable(ident: Identifier,
      changes: TableChange*): Table = readOnly
  override def dropTable(ident: Identifier): Boolean = readOnly
  override def renameTable(oldIdent: Identifier,
      newIdent: Identifier): Unit = readOnly
}
