package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Custom DataSource V2 — the `sources/` tier of the architecture: a
  * deterministic synthetic-trips generator exposed as a first-class
  * table, the library's analogue of Spark's own `range` source.
  *
  * {{{ spark.read.format("graft.sources.TripsGenProvider")
  *       .option("rows", 100000).option("slices", 8).load() }}}
  *
  * Why a generator and not a file reader: the staging/analytic file
  * paths already flow through the parquet/CSV sources; what the V2 API
  * adds is programmatic tables with genuine PLANNING participation —
  * this source implements
  *   - partition planning: `slices` index ranges, one reader per
  *     partition, embarrassingly parallel at any row count (the 100 TB
  *     shape: no driver-side row materialization, rows are born in the
  *     executors);
  *   - column pruning (`SupportsPushDownRequiredColumns`): a query that
  *     needs 3 of 5 columns generates 3 of 5 columns — visible in the
  *     BatchScan's output attributes, asserted by PlanAudit.
  *
  * Every column is PURE integer arithmetic on the row index, so any
  * engine can replay the table (`generate_series` in the DuckDB
  * oracle) and results hash-match — the same replayability contract as
  * [[graft.etl.TaxiGen]], without needing an input table at all.
  */
object TripsGenSource {

  val schema: StructType = StructType(Seq(
    StructField("trip_id", LongType, nullable = false),
    StructField("cab_type", StringType, nullable = false),
    StructField("passenger_count", LongType, nullable = false),
    StructField("fare_cents", LongType, nullable = false),
    StructField("pickup_ts", TimestampType, nullable = false)))

  val cabTypes: Array[String] = Array("yellow", "green", "uber")

  /** 2024-01-01T00:00:00Z in epoch micros. */
  val baseMicros: Long = 1704067200000000L

  /** Column generators, index-addressable by field name. */
  def gen(name: String): Long => Any = name match {
    case "trip_id" => i => i
    case "cab_type" => i => UTF8String.fromString(cabTypes((i % 3).toInt))
    case "passenger_count" => i => (i * 7 + 3) % 6
    case "fare_cents" => i => 250L + (i * 131) % 4750L
    case "pickup_ts" => i => baseMicros + ((i * 977) % 31536000L) * 1000000L
    case other => throw new IllegalArgumentException(s"no column $other")
  }
}

class TripsGenProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TripsGenSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new TripsGenTable()
}

class TripsGenTable extends Table with SupportsRead {
  override def name(): String = "graft_trips_gen"
  override def schema(): StructType = TripsGenSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TripsGenScanBuilder(
      options.getLong("rows", 1000L),
      options.getInt("slices", 4))
}

class TripsGenScanBuilder(rows: Long, slices: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = TripsGenSource.schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve generator-schema field order regardless of request order
    required = StructType(TripsGenSource.schema.fields
      .filter(f => requiredSchema.fieldNames.contains(f.name)))
  override def build(): Scan = new TripsGenScan(rows, slices, required)
}

case class TripsGenRange(start: Long, end: Long) extends InputPartition

class TripsGenScan(rows: Long, slices: Int, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def description(): String =
    s"graft-trips-gen rows=$rows slices=$slices " +
      s"columns=[${required.fieldNames.mkString(",")}]"
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = {
    val per = math.max(1L, (rows + slices - 1) / slices)
    (0L until rows by per)
      .map(s => TripsGenRange(s, math.min(s + per, rows))).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new TripsGenReaderFactory(required.fieldNames)
}

class TripsGenReaderFactory(fields: Array[String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val TripsGenRange(start, end) = p
    val gens = fields.map(TripsGenSource.gen)
    new PartitionReader[InternalRow] {
      private var i = start - 1
      override def next(): Boolean = { i += 1; i < end }
      override def get(): InternalRow =
        new GenericInternalRow(gens.map(g => g(i)).toArray[Any])
      override def close(): Unit = ()
    }
  }
}
