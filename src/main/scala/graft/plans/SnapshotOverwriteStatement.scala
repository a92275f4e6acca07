package graft.plans

import graft.etl.SnapshotStore
import graft.sources.GraftSnapshotTable
import org.apache.spark.sql.{GraftPlanBridge, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.plans.QueryPlan
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, OverwritePartitionsDynamic}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.LongType

/** Dynamic-partition `INSERT OVERWRITE` for snapshot tables.
  *
  * Under `spark.sql.sources.partitionOverwriteMode=dynamic` the
  * analyzer plans `OverwritePartitionsDynamic`, which has NO V1-write
  * fallback — a connector must either ship a full DSv2 BatchWrite or
  * reject the statement. Instead, the same post-hoc interception as
  * the MERGE statement routes it through the locked
  * [[SnapshotStore.overwritePartitions]]: restate EXACTLY the
  * partitions present in the query result as one atomic commit,
  * carrying every other partition by manifest reference — the
  * file-source dynamic-overwrite semantics, with snapshot isolation
  * and time travel on top, at cost ∝ restated data. STATIC mode
  * (Spark's default) never reaches this rule: it plans the
  * truncate-form `OverwriteByExpression`, which the table's V1 write
  * path answers by committing a fresh full snapshot. */
object SnapshotOverwriteRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperators {
      case o: OverwritePartitionsDynamic if o.query.resolved =>
        o.table.collectFirst {
          case r: DataSourceV2Relation
              if r.table.isInstanceOf[GraftSnapshotTable] =>
            r.table.asInstanceOf[GraftSnapshotTable]
        } match {
          case Some(t) => rewrite(o, t)
          case None => o
        }
    }

  private def rewrite(o: OverwritePartitionsDynamic,
      table: GraftSnapshotTable): LogicalPlan = {
    def fail(msg: String): Nothing =
      throw org.apache.spark.sql.GraftExpressionBridge.analysisException(
        s"graft snapshot INSERT OVERWRITE: $msg")
    if (!table.writable)
      fail("time-travel targets are read-only — overwriting a " +
        "historical snapshot would fork the manifest history")
    val (partCol, sortCol) = SnapshotStore.tableLayout(table.manifest)
      .getOrElse(fail(s"table at ${table.root} predates layout-recording " +
        "manifests — recommit with SnapshotStore.write"))
    // the analyzer already aligned the query to the table schema BY
    // POSITION (ResolveInsertInto casts and reorders); names are
    // re-applied at run time
    SnapshotDynamicOverwriteCommand(table.root, partCol, sortCol,
      table.schema().fieldNames.toIndexedSeq, o.query)
  }
}

/** The rewritten dynamic overwrite: one locked atomic partition
  * restatement ([[SnapshotStore.overwritePartitions]]). Returns the
  * committed snapshot id. */
case class SnapshotDynamicOverwriteCommand(
    root: String, partCol: String, sortCol: String,
    columnNames: Seq[String], query: LogicalPlan)
  extends LeafRunnableCommand {

  override val output: Seq[Attribute] =
    Seq(AttributeReference("snapshot_id", LongType, nullable = false)())

  override def innerChildren: Seq[QueryPlan[_]] = Seq(query)

  override def run(spark: SparkSession): Seq[Row] = {
    val df = GraftPlanBridge.dataFrame(spark, query)
      .toDF(columnNames: _*)
    val id = SnapshotStore.overwritePartitions(df, root, partCol, sortCol)
    Seq(Row(id))
  }
}
