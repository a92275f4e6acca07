package graft.plans

import graft.etl.SnapshotStore
import graft.operators.MergeInto
import graft.sources.GraftSnapshotTable
import org.apache.spark.sql.{GraftExpressionBridge, GraftPlanBridge, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, AttributeReference, AttributeSet, Expression, Literal, NamedExpression, Not, Or}
import org.apache.spark.sql.catalyst.expressions.{EqualTo => CatalystEqualTo}
import org.apache.spark.sql.catalyst.plans.QueryPlan
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction, InsertAction, LogicalPlan, MergeIntoTable, UpdateAction}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.LongType

/** Native SQL `MERGE INTO` for snapshot tables — the standard
  * Delta/Iceberg-style statement on top of the exact same locked,
  * manifest-stats-pruned commit path the `CALL system.merge_into`
  * procedure uses:
  *
  * {{{
  * MERGE INTO snap.t AS t USING changes AS s
  * ON t.key = s.key
  * WHEN MATCHED AND s.del THEN DELETE
  * WHEN MATCHED THEN UPDATE SET *
  * WHEN NOT MATCHED AND NOT s.del THEN INSERT *
  * }}}
  *
  * Interception point: a post-hoc-resolution rule — AFTER the analyzer
  * resolved the statement (clauses, star-expansion into per-column
  * assignments, key references) but BEFORE its "DML rewrite" batch
  * would reject the table for not implementing
  * `SupportsRowLevelOperations`. That upstream surface rewrites MERGE
  * as a whole-group copy-on-write ReplaceData plan; routing to
  * [[MergeInto.mergeClausesCommit]] instead keeps the engine's own
  * shape — single table lock across read→resolve→commit, discovery
  * scan pruned on manifest key-range stats before any file listing,
  * only touched partitions restated — which is the part that matters
  * at 100 TB. (Same plan-interception pattern Iceberg used for MERGE
  * before Spark grew the row-level API.)
  *
  * Supported subset, everything else a LOUD AnalysisException naming
  * the CALL fallback: ON must be one target-column = source-column
  * equality; matched clauses are any ordered mix of one DELETE and one
  * UPDATE SET * (clause conditions over SOURCE columns only — they are
  * pre-evaluated per change row, which is what lets the resolve stay
  * one full-outer join); one NOT MATCHED [AND cond] INSERT *; no
  * NOT MATCHED BY SOURCE (the engine's changeset model has no
  * "scan every base row" clause — by design, that clause is a full
  * table rewrite at any scale). UPDATE and INSERT must assign the same
  * source values (the SET * / INSERT * shape): the commit's change-row
  * model is whole-row, matching the procedure's semantics exactly. */
object SnapshotMergeRewrite extends Rule[LogicalPlan] {

  private def fail(msg: String): Nothing =
    throw GraftExpressionBridge.analysisException(
      s"graft snapshot MERGE INTO: $msg (the " +
        "CALL <catalog>.system.merge_into(table, source, key, " +
        "delete_flag) procedure is the general entry)")

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperators {
      case m: MergeIntoTable if m.resolved && snapTable(m).isDefined =>
        rewrite(m, snapTable(m).get)
    }

  private def snapTable(m: MergeIntoTable): Option[GraftSnapshotTable] =
    m.targetTable.collectFirst {
      case r: DataSourceV2Relation if r.table.isInstanceOf[GraftSnapshotTable] =>
        r.table.asInstanceOf[GraftSnapshotTable]
    }

  private def rewrite(m: MergeIntoTable,
      table: GraftSnapshotTable): LogicalPlan = {
    if (!table.writable)
      fail("time-travel targets are read-only — merging into a " +
        "historical snapshot would fork the manifest history")
    if (m.notMatchedBySourceActions.nonEmpty)
      fail("WHEN NOT MATCHED BY SOURCE is not supported: it scans " +
        "every base row, a full-table rewrite at any scale")
    if (m.schemaEvolutionEnabled)
      fail("WITH SCHEMA EVOLUTION is not supported on the statement; " +
        "schema evolution happens at the snapshot commit boundary")
    val (partCol, sortCol) = SnapshotStore.tableLayout(table.manifest)
      .getOrElse(fail(s"table at ${table.root} predates layout-recording " +
        "manifests — recommit with SnapshotStore.write"))
    val target = m.targetTable
    val source = m.sourceTable
    val sourceAttrs = AttributeSet(source.output)
    val targetAttrs = AttributeSet(target.output)

    // ON: exactly one target-column = source-column equality
    val (keyTarget, keySource) = m.mergeCondition match {
      case CatalystEqualTo(a: AttributeReference, b: AttributeReference)
          if targetAttrs.contains(a) && sourceAttrs.contains(b) => (a, b)
      case CatalystEqualTo(a: AttributeReference, b: AttributeReference)
          if targetAttrs.contains(b) && sourceAttrs.contains(a) => (b, a)
      case other => fail("the ON clause must be a single " +
        s"target-column = source-column equality, got: ${other.sql}")
    }

    def sourceOnly(what: String, e: Expression): Expression = {
      if (!e.references.subsetOf(sourceAttrs))
        fail(s"$what may reference SOURCE columns only (they are " +
          "evaluated per change row before the resolve join); found " +
          s"target references in: ${e.sql}")
      e
    }

    // matched clauses fold in statement order: SQL takes the FIRST
    // clause whose condition passes, so each accumulated condition is
    // guarded by the negation of every earlier one. Each condition is
    // NULL-COALESCED to false BEFORE entering the fold: SQL treats a
    // NULL condition as "clause not satisfied, fall through" — a raw
    // Not(NULL) would poison `noEarlier` to NULL and silently suppress
    // every LATER clause instead of evaluating it.
    def satisfied(c: Option[Expression], what: String): Expression =
      org.apache.spark.sql.catalyst.expressions.Coalesce(Seq(
        sourceOnly(what, c.getOrElse(Literal.TrueLiteral)),
        Literal.FalseLiteral))
    var delCond: Expression = Literal.FalseLiteral
    var updCond: Expression = Literal.FalseLiteral
    var updAssigns: Option[Seq[Assignment]] = None
    var noEarlier: Expression = Literal.TrueLiteral
    m.matchedActions.foreach {
      case DeleteAction(c) =>
        val cc = satisfied(c, "a WHEN MATCHED condition")
        delCond = Or(delCond, And(noEarlier, cc))
        noEarlier = And(noEarlier, Not(cc))
      case UpdateAction(c, assigns, _) =>
        if (updAssigns.isDefined) fail("at most one UPDATE clause")
        val cc = satisfied(c, "a WHEN MATCHED condition")
        updCond = Or(updCond, And(noEarlier, cc))
        updAssigns = Some(assigns)
        noEarlier = And(noEarlier, Not(cc))
      case other =>
        fail(s"unsupported WHEN MATCHED action: $other")
    }
    var insCond: Expression = Literal.FalseLiteral
    var insAssigns: Option[Seq[Assignment]] = None
    m.notMatchedActions.foreach {
      case InsertAction(c, assigns) =>
        if (insAssigns.isDefined) fail("at most one INSERT clause")
        insCond = satisfied(c, "a WHEN NOT MATCHED condition")
        insAssigns = Some(assigns)
      case other =>
        fail(s"unsupported WHEN NOT MATCHED action: $other")
    }

    // change-row projection: one value per target column, source-only.
    // UPDATE SET * and INSERT * resolve to identical aligned
    // assignment lists; a partial SET (unassigned columns keep the
    // TARGET value) resolves to target references and fails the
    // source-only check — honestly, since the whole-row change model
    // cannot express "keep old".
    def valueMap(assigns: Seq[Assignment], what: String)
        : Map[String, Expression] = assigns.map { a =>
      val name = a.key match {
        case att: Attribute => att.name
        case other => fail(s"$what assigns a non-column key: ${other.sql}")
      }
      name -> sourceOnly(s"the $what assignment to '$name'", a.value)
    }.toMap
    val updMap = updAssigns.map(valueMap(_, "UPDATE SET"))
    val insMap = insAssigns.map(valueMap(_, "INSERT"))
    for (u <- updMap; i <- insMap) {
      val diverging = target.output.map(_.name).filter(n =>
        u.get(n).zip(i.get(n)).exists { case (a, b) => !a.semanticEquals(b) })
      if (diverging.nonEmpty)
        fail("UPDATE and INSERT must assign the same source values " +
          s"(the SET * / INSERT * shape); they diverge on: " +
          diverging.mkString(", "))
    }
    val values = updMap.orElse(insMap)
    val projValues: Seq[Expression] = target.output.map { att =>
      values match {
        case Some(vm) => vm.getOrElse(att.name,
          fail(s"no assignment covers target column '${att.name}' — " +
            "partial SET keeps target values, which the whole-row " +
            "change model cannot express; use SET *"))
        case None =>
          // delete-only MERGE: only the key column must carry real
          // values (it drives the match); the rest ride along as
          // typed nulls and can never land (nothing updates/inserts)
          if (att.name == keyTarget.name) keySource
          else Literal.create(null, att.dataType)
      }
    }
    // the projected key must BE the ON clause's source key — otherwise
    // the commit would join on a different value than the statement
    val projNames = target.output.map(_.name)
    projNames.zip(projValues).find(_._1 == keyTarget.name) match {
      case Some((_, v)) if v.semanticEquals(keySource) => ()
      case _ => fail(s"the assignment to key column '${keyTarget.name}' " +
        s"must be the ON clause's source column ${keySource.sql} — the " +
        "commit joins base and changes on that single key")
    }

    // names ride SEPARATELY from the value expressions: the analyzer's
    // CleanupAliases strips Alias nodes out of every operator's
    // expression fields, so Alias-carried names would not survive to
    // execution
    SnapshotMergeCommand(table.root, partCol, sortCol, source,
      keyTarget.name, projNames, projValues, delCond, updCond, insCond)
  }
}

/** The rewritten MERGE as an eagerly-executed command: builds the
  * change frame from the (already analyzed) source plan — table-column
  * projection plus the three clause-condition booleans, all evaluated
  * per source row — and hands it to the locked
  * [[MergeInto.mergeClausesCommit]]. Returns the committed snapshot id
  * (one row), like the CALL procedure. */
case class SnapshotMergeCommand(
    root: String, partCol: String, sortCol: String,
    source: LogicalPlan, key: String,
    projNames: Seq[String], projValues: Seq[Expression],
    delCond: Expression, updCond: Expression,
    insCond: Expression) extends LeafRunnableCommand {

  override val output: Seq[Attribute] =
    Seq(AttributeReference("snapshot_id", LongType, nullable = false)())

  override def innerChildren: Seq[QueryPlan[_]] = Seq(source)

  override def run(spark: SparkSession): Seq[Row] = {
    val src = GraftPlanBridge.dataFrame(spark, source)
    val c = GraftExpressionBridge.column _
    val projCols = projNames.zip(projValues).map {
      case (n, v) => c(v).as(n)
    }
    val changes = src.select(projCols ++ Seq(
      c(delCond).as(MergeInto.DelCol),
      c(updCond).as(MergeInto.UpdCol),
      c(insCond).as(MergeInto.InsCol)): _*)
    val id = MergeInto.mergeClausesCommit(spark, root, changes, key,
      partCol, sortCol)
    Seq(Row(id))
  }
}
