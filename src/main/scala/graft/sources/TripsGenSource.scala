package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsReportStatistics}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
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
  *     BatchScan's output attributes, asserted by PlanAudit;
  *   - filter pushdown (`SupportsPushDownFilters`): trip_id IS the row
  *     index, so comparison/equality conjuncts on it tighten the
  *     generated [lo, hi) range BEFORE partition planning — the
  *     file-source partition-pruning shape (a predicate that survives
  *     to the scan prunes whole InputPartitions, not rows). Honored
  *     conjuncts are fully absorbed: the Filter node disappears from
  *     the plan, and a contradiction (trip_id < 0) plans ZERO
  *     partitions. Everything else stays post-scan;
  *   - statistics (`SupportsReportStatistics`): row count and byte size
  *     of the PRUNED range, so join planning sees a post-pushdown
  *     estimate (a trip_id slice of a huge generated table broadcasts).
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
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = TripsGenSource.schema
  private var lo: Long = 0L   // inclusive generation start
  private var hi: Long = rows // exclusive generation end
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve generator-schema field order regardless of request order
    required = StructType(TripsGenSource.schema.fields
      .filter(f => requiredSchema.fieldNames.contains(f.name)))

  /** Absorb trip_id comparisons into the generated range. trip_id = i
    * exactly, so an absorbed conjunct is FULLY honored (no residual
    * re-evaluation — return only the rejects). Spark hands conjuncts
    * pre-split; literals arrive as the column's resolved numeric type. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    def lv(a: Any): Option[Long] = a match {
      case n: Number => Some(n.longValue())
      case _ => None
    }
    val (accepted, rejected) = filters.partition {
      case EqualTo("trip_id", v) => lv(v).isDefined
      case GreaterThan("trip_id", v) => lv(v).isDefined
      case GreaterThanOrEqual("trip_id", v) => lv(v).isDefined
      case LessThan("trip_id", v) => lv(v).isDefined
      case LessThanOrEqual("trip_id", v) => lv(v).isDefined
      case _ => false
    }
    accepted.foreach {
      case EqualTo(_, v) =>
        lo = math.max(lo, lv(v).get); hi = math.min(hi, lv(v).get + 1)
      case GreaterThan(_, v) => lo = math.max(lo, lv(v).get + 1)
      case GreaterThanOrEqual(_, v) => lo = math.max(lo, lv(v).get)
      case LessThan(_, v) => hi = math.min(hi, lv(v).get)
      case LessThanOrEqual(_, v) => hi = math.min(hi, lv(v).get + 1)
      case _ => ()
    }
    pushed = accepted
    rejected
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new TripsGenScan(rows, slices, required, lo, math.max(lo, hi), pushed)
}

case class TripsGenRange(start: Long, end: Long) extends InputPartition

class TripsGenScan(rows: Long, slices: Int, required: StructType,
    lo: Long, hi: Long, pushed: Array[Filter])
    extends Scan with Batch with SupportsReportStatistics {
  override def readSchema(): StructType = required
  override def description(): String =
    s"graft-trips-gen rows=$rows slices=$slices range=[$lo,$hi) " +
      s"columns=[${required.fieldNames.mkString(",")}] " +
      s"PushedFilters: [${pushed.mkString(", ")}]"
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = {
    if (hi <= lo) return Array.empty
    // Split granularity comes from the UNPRUNED table (rows/slices),
    // file-source style: pushdown drops whole partitions instead of
    // re-slicing the survivor range into `slices` micro-partitions.
    val per = math.max(1L, (rows + slices - 1) / slices)
    (lo until hi by per)
      .map(s => TripsGenRange(s, math.min(s + per, hi))).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new TripsGenReaderFactory(required.fieldNames)

  /** Post-pushdown estimate: exact row count of the pruned range; bytes
    * from fixed per-column widths (8B numerics/ts, ~8B cab strings). */
  override def estimateStatistics(): Statistics = new Statistics {
    private val n = math.max(0L, hi - lo)
    override def sizeInBytes: java.util.OptionalLong =
      java.util.OptionalLong.of(n * math.max(8, required.size * 8).toLong)
    override def numRows: java.util.OptionalLong =
      java.util.OptionalLong.of(n)
  }
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
