package graft.plans

import graft.etl.SnapshotStore
import graft.operators.MergeInto
import graft.sources.GraftSnapshotTable
import org.apache.spark.sql.{GraftExpressionBridge, GraftPlanBridge, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeReference, AttributeSet, Expression, Literal, Not, Or}
import org.apache.spark.sql.catalyst.expressions.{EqualTo => CatalystEqualTo}
import org.apache.spark.sql.catalyst.plans.QueryPlan
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction, InsertAction, LogicalPlan, MergeIntoTable, UpdateAction}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.LongType

/** Native SQL `MERGE INTO` for snapshot tables — the standard
  * Delta/Iceberg-style statement on top of the same locked,
  * manifest-stats-pruned commit path the `CALL system.merge_into`
  * procedure uses:
  *
  * {{{
  * MERGE INTO snap.t AS t USING changes AS s
  * ON t.key = s.key
  * WHEN MATCHED AND t.status = 'open' THEN UPDATE SET price = s.p
  * WHEN MATCHED AND s.del THEN DELETE
  * WHEN NOT MATCHED AND NOT s.del THEN INSERT *
  * }}}
  *
  * Interception point: a post-hoc-resolution rule — AFTER the analyzer
  * resolved the statement (clauses, star-expansion into per-column
  * assignments, key references) but BEFORE its "DML rewrite" batch
  * would reject the table for not implementing
  * `SupportsRowLevelOperations`. That upstream surface rewrites MERGE
  * as a whole-group copy-on-write ReplaceData plan; routing to
  * [[MergeInto.mergeGeneralCommit]] instead keeps the engine's own
  * shape — single table lock across read→resolve→commit, discovery
  * scan pruned on manifest key-range stats before any file listing,
  * only touched partitions restated — which is the part that matters
  * at 100 TB. (Same plan-interception pattern Iceberg used for MERGE
  * before Spark grew the row-level API.)
  *
  * Clause semantics supported: matched clauses are any ordered mix of
  * one DELETE and one UPDATE, first-match-wins; conditions may
  * reference BOTH target and source columns and a partial `SET` keeps
  * unassigned target values (everything evaluates on the resolve join,
  * where both rows are in scope). One `NOT MATCHED [AND cond] INSERT`
  * clause (condition/values source-only — SQL's own contract).
  * `WHEN NOT MATCHED BY SOURCE [AND cond] THEN DELETE/UPDATE` — the
  * full-sync idiom (retire target rows the source dropped) — is
  * supported with target-only conditions/values; its discovery is
  * honest about the semantics (every partition not PROVABLY outside
  * the clause condition by manifest stats restates — a full-sync IS a
  * full-table pass; bound it with a partition-column conjunct). Still
  * refused loudly: ON shapes other than one target-column =
  * source-column equality (the keyed-commit model), more than one
  * clause of a kind, and — because discovery and resolve evaluate the
  * clause expressions in SEPARATE jobs — subqueries,
  * non-deterministic expressions and the current-time family (the
  * same two-pass contract as row-level UPDATE/DELETE; bind times to
  * literals first). */
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

    // discovery, resolve and the CDC changeset evaluate every clause
    // expression in SEPARATE jobs — the same two-pass hazard as
    // row-level UPDATE, the same loud analysis-time refusals
    def checked(what: String, e: Expression): Expression = {
      RowLevelStatements.checkPredicate("MERGE INTO", what, e)
      if (!e.references.subsetOf(targetAttrs ++ sourceAttrs))
        fail(s"$what references columns of neither the target nor " +
          s"the source: ${e.sql}")
      e
    }
    def sourceOnly(what: String, e: Expression): Expression = {
      checked(what, e)
      if (!e.references.subsetOf(sourceAttrs))
        fail(s"$what may reference SOURCE columns only (a NOT MATCHED " +
          s"row has no target values); found target references in: " +
          s"${e.sql}")
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
        checked(what, c.getOrElse(Literal.TrueLiteral)),
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
        insCond = org.apache.spark.sql.catalyst.expressions.Coalesce(Seq(
          sourceOnly("a WHEN NOT MATCHED condition",
            c.getOrElse(Literal.TrueLiteral)),
          Literal.FalseLiteral))
        insAssigns = Some(assigns)
      case other =>
        fail(s"unsupported WHEN NOT MATCHED action: $other")
    }
    // NOT MATCHED BY SOURCE clauses (the full-sync idiom: retire or
    // delete target rows the source no longer carries): conditions and
    // SET values may reference the TARGET side only — the source row is
    // absent by definition. Same first-match-wins fold as the matched
    // clauses, a separate clause chain (SQL keeps the three lists
    // independent).
    def targetOnly(what: String, e: Expression): Expression = {
      checked(what, e)
      if (!e.references.subsetOf(targetAttrs))
        fail(s"$what may reference TARGET columns only (a NOT MATCHED " +
          s"BY SOURCE row has no source values); found source " +
          s"references in: ${e.sql}")
      e
    }
    def bsSatisfied(c: Option[Expression]): Expression =
      org.apache.spark.sql.catalyst.expressions.Coalesce(Seq(
        targetOnly("a WHEN NOT MATCHED BY SOURCE condition",
          c.getOrElse(Literal.TrueLiteral)),
        Literal.FalseLiteral))
    var bsDelCond: Expression = Literal.FalseLiteral
    var bsUpdCond: Expression = Literal.FalseLiteral
    var bsUpdAssigns: Option[Seq[Assignment]] = None
    var bsNoEarlier: Expression = Literal.TrueLiteral
    // the RAW disjunction of the clause conditions, kept aside for
    // discovery: manifest-stats pruning translates it through the
    // planner's filter translation, which cannot see through the
    // Coalesce/first-match-wins folding below — a clause with no
    // condition makes it TRUE (every partition is a candidate)
    var bsAnyCond: Expression = Literal.FalseLiteral
    def bsAny(c: Option[Expression]): Unit = bsAnyCond =
      if (c.isEmpty || bsAnyCond == Literal.TrueLiteral) Literal.TrueLiteral
      else if (bsAnyCond == Literal.FalseLiteral) c.get
      else Or(bsAnyCond, c.get)
    m.notMatchedBySourceActions.foreach {
      case DeleteAction(c) =>
        val cc = bsSatisfied(c)
        bsDelCond = Or(bsDelCond, And(bsNoEarlier, cc))
        bsNoEarlier = And(bsNoEarlier, Not(cc))
        bsAny(c)
      case UpdateAction(c, assigns, _) =>
        if (bsUpdAssigns.isDefined)
          fail("at most one NOT MATCHED BY SOURCE UPDATE clause")
        val cc = bsSatisfied(c)
        bsUpdCond = Or(bsUpdCond, And(bsNoEarlier, cc))
        bsUpdAssigns = Some(assigns)
        bsNoEarlier = And(bsNoEarlier, Not(cc))
        bsAny(c)
      case other =>
        fail(s"unsupported WHEN NOT MATCHED BY SOURCE action: $other")
    }
    val hasBySource = m.notMatchedBySourceActions.nonEmpty

    def assignName(a: Assignment, what: String): String = a.key match {
      case att: Attribute => att.name
      case other => fail(s"$what assigns a non-column key: ${other.sql}")
    }
    // UPDATE SET: partial is fine — unassigned columns keep the TARGET
    // value (the resolve join has the base row in scope); values may
    // reference both sides
    val updPairs: Seq[(String, Expression)] =
      updAssigns.getOrElse(Seq.empty).map { a =>
        val n = assignName(a, "UPDATE SET")
        n -> checked(s"the UPDATE SET assignment to '$n'", a.value)
      }
    if (updPairs.map(_._1).distinct.size != updPairs.size)
      fail("duplicate UPDATE SET column among: " +
        updPairs.map(_._1).mkString(", "))
    // INSERT: must cover every target column (there is no base row to
    // keep values from), source-only values
    val insPairs: Seq[(String, Expression)] =
      insAssigns.getOrElse(Seq.empty).map { a =>
        val n = assignName(a, "INSERT")
        n -> sourceOnly(s"the INSERT assignment to '$n'", a.value)
      }
    insAssigns.foreach { _ =>
      val covered = insPairs.map(_._1.toLowerCase).toSet
      val missing = target.output.map(_.name)
        .filterNot(n => covered(n.toLowerCase))
      if (missing.nonEmpty)
        fail("the INSERT clause must assign every target column " +
          s"(no base row exists to keep values from); missing: " +
          missing.mkString(", "))
    }

    // by-source UPDATE SET: partial keeps target values, like the
    // matched SET — but values are target-only (no source row exists)
    val bsUpdPairs: Seq[(String, Expression)] =
      bsUpdAssigns.getOrElse(Seq.empty).map { a =>
        val n = assignName(a, "NOT MATCHED BY SOURCE UPDATE SET")
        n -> targetOnly(
          s"the NOT MATCHED BY SOURCE SET assignment to '$n'", a.value)
      }
    if (bsUpdPairs.map(_._1).distinct.size != bsUpdPairs.size)
      fail("duplicate NOT MATCHED BY SOURCE SET column among: " +
        bsUpdPairs.map(_._1).mkString(", "))

    // does SET move rows across partitions? the layout may be a
    // multi-transform SPEC — a row moves if ANY partition source
    // column is assigned anything but itself (only a self-assignment,
    // or no assignment, provably keeps a row in place)
    def movesPartition(pairs: Seq[(String, Expression)]): Boolean =
      graft.etl.SnapshotStore.parseSpec(partCol)
        .sourceCols.exists { pc =>
          pairs.toMap.get(pc).exists {
            case a: AttributeReference =>
              !target.output.filter(_.name == pc).exists(_.semanticEquals(a))
            case _ => true
          }
        }
    val partColMoved = movesPartition(updPairs)
    val bsPartColMoved = movesPartition(bsUpdPairs)

    // names ride SEPARATELY from the value expressions: the analyzer's
    // CleanupAliases strips Alias nodes out of every operator's
    // expression fields, so Alias-carried names would not survive to
    // execution. Source attr ids ride along so run() can rebind each
    // reference to its JOIN SIDE by name ("b." target / "c." source).
    SnapshotMergeCommand(table.root, partCol, sortCol, source,
      keyTarget.name, keySource.name,
      updPairs.map(_._1), updPairs.map(_._2),
      insPairs.map(_._1), insPairs.map(_._2),
      delCond, updCond, insCond,
      source.output.map(_.exprId.id), partColMoved,
      hasBySource, bsDelCond, bsUpdCond, bsAnyCond,
      bsUpdPairs.map(_._1), bsUpdPairs.map(_._2), bsPartColMoved)
  }
}

/** The rewritten MERGE as an eagerly-executed command: rebinds the
  * (analysis-time resolved) clause expressions against the resolve
  * join's aliases — every target reference by name under `"b"`, every
  * source reference under `"c"` (told apart by the source output's
  * expr ids, carried in `sourceIds`) — and hands the program to the
  * locked [[MergeInto.mergeGeneralCommit]]. Returns the committed
  * snapshot id (one row), like the CALL procedure. */
case class SnapshotMergeCommand(
    root: String, partCol: String, sortCol: String,
    source: LogicalPlan, keyTarget: String, keySource: String,
    updNames: Seq[String], updValues: Seq[Expression],
    insNames: Seq[String], insValues: Seq[Expression],
    delCond: Expression, updCond: Expression, insCond: Expression,
    sourceIds: Seq[Long], partColMoved: Boolean,
    hasBySource: Boolean = false,
    bsDelCond: Expression = Literal.FalseLiteral,
    bsUpdCond: Expression = Literal.FalseLiteral,
    bsAnyCond: Expression = Literal.FalseLiteral,
    bsUpdNames: Seq[String] = Seq.empty,
    bsUpdValues: Seq[Expression] = Seq.empty,
    bsPartColMoved: Boolean = false)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] =
    Seq(AttributeReference("snapshot_id", LongType, nullable = false)())

  override def innerChildren: Seq[QueryPlan[_]] = Seq(source)

  override def run(spark: SparkSession): Seq[Row] = {
    val src = GraftPlanBridge.dataFrame(spark, source)
    val srcIds = sourceIds.toSet
    // join-side rebinding: the command reads the CURRENT snapshot
    // under the table lock (never the analysis-time relation), so
    // attribute references re-resolve BY NAME against the join aliases
    def qual(e: Expression): org.apache.spark.sql.Column =
      GraftExpressionBridge.column(e.transform {
        case a: AttributeReference => UnresolvedAttribute(
          Seq(if (srcIds(a.exprId.id)) "c" else "b", a.name))
      })
    // bare-source rebinding for the pre-join landing discovery pass
    def bare(e: Expression): org.apache.spark.sql.Column =
      GraftExpressionBridge.column(e.transform {
        case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
      })
    val insMapExpr = insNames.zip(insValues).toMap
    // the landing-discovery pass needs a bare-source value for every
    // partition SOURCE column of the spec (the rewrite has already
    // checked the INSERT clause covers every table column)
    val specCols = graft.etl.SnapshotStore.parseSpec(partCol).sourceCols
    // by-source expressions reference the target only, so their bare
    // form resolves against the unaliased table frame (the discovery
    // pass) and the qualified form against the "b" join side
    val bySource =
      if (!hasBySource) None
      else Some(MergeInto.BySourceProgram(
        bsDel = qual(bsDelCond), bsUpd = qual(bsUpdCond),
        updValues = bsUpdNames.zip(bsUpdValues.map(qual)).toMap,
        bareCond = bare(bsAnyCond),
        bareUpdValues = bsUpdNames.zip(bsUpdValues.map(bare)).toMap,
        partColMovedByUpdate = bsPartColMoved))
    val prog = MergeInto.MergeClauseProgram(
      del = qual(delCond), upd = qual(updCond), ins = qual(insCond),
      updValues = updNames.zip(updValues.map(qual)).toMap,
      insValues = insNames.zip(insValues.map(qual)).toMap,
      insSourceCond = bare(insCond),
      insSourceValues =
        if (insNames.isEmpty) Map.empty
        else specCols.map(c => c -> bare(insMapExpr.getOrElse(c,
          throw new IllegalStateException(
            s"INSERT clause covers no '$c' — unreachable, the " +
              "rewrite checks coverage")))).toMap,
      partColMovedByUpdate = partColMoved,
      bySource = bySource,
      hasMatchedClauses = delCond != Literal.FalseLiteral ||
        updCond != Literal.FalseLiteral)
    val id = MergeInto.mergeGeneralCommit(spark, root, src,
      keyTarget, keySource, prog, partCol, sortCol)
    Seq(Row(id))
  }
}
