package graft.plans

import graft.etl.SnapshotStore
import graft.operators.RowLevelOps
import graft.sources.GraftSnapshotTable
import org.apache.spark.sql.{GraftExpressionBridge, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeReference, Expression, Literal, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.QueryPlan
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteFromTable, LogicalPlan, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.LongType

/** Native SQL `UPDATE` and row-level `DELETE` for snapshot tables —
  * the copy-on-write mutations in the standard Delta/Iceberg shape
  * (the reference's ClickHouse exposes these as `ALTER TABLE …
  * UPDATE/DELETE` mutations; an extension here, not in the reference's
  * query set), routed through [[RowLevelOps]]:
  *
  *   - `UPDATE snap.t SET price = price * 2 WHERE m = '2024-01'`
  *   - `DELETE FROM snap.t WHERE price > 25.0` (predicates the
  *     metadata-only partition drop cannot express; partition-value
  *     predicates keep taking the existing `SupportsDelete` fast path,
  *     which never touches data files)
  *
  * Interception point: post-hoc resolution — after the analyzer
  * resolved columns and aligned assignments, before the DML-rewrite
  * batch rejects the table for not implementing
  * `SupportsRowLevelOperations` (the same seam as
  * [[SnapshotMergeRewrite]]).
  *
  * Both statements require DETERMINISTIC conditions/assignments and
  * refuse subqueries loudly: the commit evaluates the predicate twice
  * (discovery, rewrite), and a non-deterministic or re-optimized
  * subquery plan could make the passes disagree — silently corrupting
  * the restatement. Delta materializes subquery results to close this;
  * here the loud fallback is a temp view + MERGE. */
object SnapshotUpdateRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperators {
      case u: UpdateTable
          if u.resolved && RowLevelStatements.snapTable(u.table).isDefined =>
        rewrite(u, RowLevelStatements.snapTable(u.table).get)
    }

  private def rewrite(u: UpdateTable,
      table: GraftSnapshotTable): LogicalPlan = {
    import RowLevelStatements.{checkPredicate, layoutOrFail}
    def bad(msg: String): Nothing = RowLevelStatements.fail("UPDATE", msg)
    val (partCol, sortCol) = layoutOrFail(table, "UPDATE")
    u.condition.foreach(c => checkPredicate("UPDATE", "the WHERE clause", c))
    val (names, values) = u.assignments.map {
      case Assignment(key: Attribute, value) =>
        checkPredicate("UPDATE", s"the assignment to '${key.name}'", value)
        key.name -> value
      case Assignment(other, _) =>
        bad("SET targets a nested field or non-column expression " +
          s"(${other.sql}) — only whole-column assignment is supported")
    }.unzip
    if (names.distinct.size != names.size)
      bad(s"duplicate SET column among: ${names.mkString(", ")}")
    SnapshotUpdateCommand(table.root, partCol, sortCol, u.condition,
      names, values)
  }
}

/** Row-level `DELETE FROM` — ONLY for predicates the partition-drop
  * path cannot express; partition-value predicates pass through
  * untouched to the existing `SupportsDelete` metadata-only commit. */
object SnapshotRowDeleteRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperators {
      case d @ DeleteFromTable(target, condition)
          if d.resolved && RowLevelStatements.snapTable(target).isDefined &&
            !partitionGranular(
              RowLevelStatements.snapTable(target).get, condition) =>
        rewrite(d, condition, RowLevelStatements.snapTable(target).get)
    }

  /** Can the existing metadata-only partition drop serve this
    * predicate? Mirrors the planner's own translation
    * (`DataSourceStrategy.translateFilter` over the conjuncts) and the
    * table's partition-token check, so a predicate this rule leaves
    * alone can never bounce off `canDeleteWhere` later. A timezone
    * mismatch on a TZ-timestamp partition column lands HERE (the token
    * path refuses), falling through to the row-level rewrite, whose
    * commit then refuses loudly at the layout check — data-value
    * evaluation is correct under any zone, but the restatement would
    * render partition tokens under the wrong one. */
  private def partitionGranular(table: GraftSnapshotTable,
      condition: Expression): Boolean = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    val cs = conjuncts(condition).filterNot(_ == Literal.TrueLiteral)
    val translated = cs.map(c =>
      org.apache.spark.sql.GraftPlanBridge.translateFilter(c))
    translated.forall(_.isDefined) &&
      table.partitionGranularDelete(translated.flatten.toArray)
  }

  private def rewrite(d: DeleteFromTable, condition: Expression,
      table: GraftSnapshotTable): LogicalPlan = {
    import RowLevelStatements._
    val (partCol, sortCol) = layoutOrFail(table, "row-level DELETE")
    checkPredicate("row-level DELETE", "the WHERE clause", condition)
    SnapshotDeleteRowsCommand(table.root, partCol, sortCol, condition)
  }
}

private[plans] object RowLevelStatements {

  def fail(stmt: String, msg: String): Nothing =
    throw GraftExpressionBridge.analysisException(
      s"graft snapshot $stmt: $msg (a temp view + MERGE INTO, or " +
        "CALL <catalog>.system.merge_into, is the general fallback)")

  def snapTable(plan: LogicalPlan): Option[GraftSnapshotTable] =
    plan.collectFirst {
      case r: DataSourceV2Relation
          if r.table.isInstanceOf[GraftSnapshotTable] =>
        r.table.asInstanceOf[GraftSnapshotTable]
    }

  def layoutOrFail(table: GraftSnapshotTable,
      stmt: String): (String, String) = {
    if (!table.writable)
      fail(stmt, "time-travel targets are read-only — mutating a " +
        "historical snapshot would fork the manifest history")
    SnapshotStore.tableLayout(table.manifest).getOrElse(
      fail(stmt, s"table at ${table.root} predates layout-recording " +
        "manifests — recommit with SnapshotStore.write"))
  }

  /** The copy-on-write commit evaluates predicates/assignments once
    * for discovery and once for the rewrite — anything whose two
    * evaluations can differ is refused at analysis, loudly. That
    * includes the current-time family: `now()`/`current_date()` report
    * `deterministic = true` (they are constant WITHIN one query via
    * ComputeCurrentTime) but the discovery and rewrite are two
    * separately-optimized jobs, each stamping its own time — Delta
    * freezes the timestamp for exactly this reason; here the loud
    * fallback is binding the time to a literal first. */
  def checkPredicate(stmt: String, what: String, e: Expression): Unit = {
    import org.apache.spark.sql.catalyst.expressions.{CurrentDate, CurrentTimestamp, CurrentTimeZone, LocalTimestamp, Now}
    if (SubqueryExpression.hasSubquery(e))
      fail(stmt, s"$what contains a subquery — the discovery and " +
        "rewrite passes could observe different subquery results; " +
        "materialize it to a temp view and use MERGE INTO")
    if (!e.deterministic)
      fail(stmt, s"$what is non-deterministic (${e.sql}) — the " +
        "discovery and rewrite passes would disagree on which rows " +
        "match")
    val timey = e.exists {
      case _: CurrentTimestamp | _: Now | _: CurrentDate |
           _: LocalTimestamp | _: CurrentTimeZone => true
      case _ => false
    }
    if (timey)
      fail(stmt, s"$what references the current time (${e.sql}) — " +
        "each of the discovery and rewrite passes would stamp its own " +
        "now(); bind the time to a literal (e.g. a session variable " +
        "or an inlined timestamp) first")
  }

  /** Resolved attribute references are re-bound BY NAME against the
    * freshly-read table inside the commit (the command reads the
    * CURRENT snapshot under the table lock — never the analysis-time
    * relation, whose pinned manifest could trail a concurrent
    * commit). */
  def rebind(e: Expression): org.apache.spark.sql.Column =
    GraftExpressionBridge.column(e.transform {
      case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
    })
}

/** The rewritten UPDATE as an eagerly-executed command over the locked
  * [[RowLevelOps.updateCommit]]. Assignment names ride separately from
  * the value expressions (CleanupAliases strips Alias nodes from
  * command expression fields). Returns the committed snapshot id. */
case class SnapshotUpdateCommand(root: String, partCol: String,
    sortCol: String, condition: Option[Expression], setNames: Seq[String],
    setValues: Seq[Expression]) extends LeafRunnableCommand {

  override val output: Seq[Attribute] =
    Seq(org.apache.spark.sql.catalyst.expressions
      .AttributeReference("snapshot_id", LongType, nullable = false)())

  override def innerChildren: Seq[QueryPlan[_]] = Nil

  override def run(spark: SparkSession): Seq[Row] = {
    import RowLevelStatements.rebind
    val cond = condition.map(rebind)
      .getOrElse(org.apache.spark.sql.functions.lit(true))
    val id = RowLevelOps.updateCommit(spark, root, cond,
      setNames.zip(setValues.map(rebind)), partCol, sortCol)
    Seq(Row(id))
  }
}

/** The rewritten row-level DELETE over the locked
  * [[RowLevelOps.deleteRowsCommit]]. Returns the committed snapshot
  * id (the prior id when nothing matched — no-op deletes never burn
  * a snapshot, matching the partition-drop path). */
case class SnapshotDeleteRowsCommand(root: String, partCol: String,
    sortCol: String, condition: Expression) extends LeafRunnableCommand {

  override val output: Seq[Attribute] =
    Seq(org.apache.spark.sql.catalyst.expressions
      .AttributeReference("snapshot_id", LongType, nullable = false)())

  override def innerChildren: Seq[QueryPlan[_]] = Nil

  override def run(spark: SparkSession): Seq[Row] = {
    val id = RowLevelOps.deleteRowsCommit(spark, root,
      RowLevelStatements.rebind(condition), partCol, sortCol)
    Seq(Row(id))
  }
}
