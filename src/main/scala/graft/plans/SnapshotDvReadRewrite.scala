package graft.plans

import graft.etl.SnapshotStore
import graft.sources.GraftSnapshotTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{DeleteFromTable, InsertIntoStatement, LogicalPlan, MergeIntoTable, Project, UpdateTable, V2WriteCommand}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** DELETION-VECTOR read rewrite — the analysis rule that makes
  * merge-on-read DML invisible to every SQL reader: a batch relation
  * over a snapshot table whose manifest carries live deletion vectors
  * ([[SnapshotStore.DvRef]]) is replaced by the DV-APPLIED plan (the
  * same multi-root parquet read the Scala API plans, anti-joined
  * against the broadcast position vectors), with the relation's output
  * attribute ids preserved so the surrounding plan re-binds untouched.
  *
  * Plan shape at scale: the vectors are fraction-capped tiny (the
  * write path falls back to copy-on-write restatement above
  * `graft.dv.maxDeleteFraction`), so the anti-join is a broadcast —
  * a map-side filter over the scan, no shuffle of the data; filters on
  * data columns still push through the anti-join's left side into the
  * parquet scan (Catalyst pushes left-side predicates through
  * LeftAnti).
  *
  * What is deliberately NOT rewritten:
  *   - write TARGETS ([[V2WriteCommand]] tables, INSERT targets) —
  *     only their query side is recursed into;
  *   - UPDATE/DELETE/MERGE statements' target relations — the graft
  *     DML rewrites own those and read through the (DV-aware) Scala
  *     API; a MERGE's SOURCE side is recursed into (it may read a
  *     DV-bearing table);
  *   - streaming relations — the tail reads per-commit APPENDED dirs,
  *     which never carry vectors at birth.
  *
  * A session WITHOUT this rule (no [[graft.GraftExtensions]]) is
  * caught by the scan's `toBatch` guard, which refuses loudly instead
  * of resurrecting deleted rows. (Delta's DV reads take the same
  * shape: scan + anti-join of the position bitmap, fused into the
  * reader; an `Expression`-level row filter inside the parquet reader
  * factory is the further fusion step, not needed while vectors stay
  * broadcast-small.) */
object SnapshotDvReadRewrite extends Rule[LogicalPlan] {

  private def isDvRelation(r: DataSourceV2Relation): Boolean =
    r.table match {
      case t: GraftSnapshotTable => t.needsResolvedRead
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // hot path: no DV-bearing snapshot relation anywhere (subqueries
    // included) — return the plan untouched
    val any = plan.collectWithSubqueries {
      case r: DataSourceV2Relation if isDvRelation(r) => true
    }
    if (any.isEmpty) plan else rewrite(plan)
  }

  private def rewrite(p: LogicalPlan): LogicalPlan = {
    val rewritten = p match {
      // DML statements: the graft rewrites own the TARGET (they read
      // through the DV-aware Scala API); only MERGE has a source plan
      // worth recursing into
      case u: UpdateTable => u
      case d: DeleteFromTable => d
      case m: MergeIntoTable => m.copy(sourceTable = rewrite(m.sourceTable))
      // writes: never touch the target table child, recurse the query
      case w: V2WriteCommand => w.withNewQuery(rewrite(w.query))
      case i: InsertIntoStatement => i.copy(query = rewrite(i.query))
      case r: DataSourceV2Relation if isDvRelation(r) => replace(r)
      case other => other.mapChildren(rewrite)
    }
    rewritten match {
      case u: UpdateTable => u
      case d: DeleteFromTable => d
      case m: MergeIntoTable => m
      case other => other.transformExpressionsUp {
        case s: SubqueryExpression => s.withNewPlan(rewrite(s.plan))
      }
    }
  }

  private def replace(r: DataSourceV2Relation): LogicalPlan = {
    val t = r.table.asInstanceOf[GraftSnapshotTable]
    val spark = SparkSession.active
    val child = SnapshotStore
      .readManifestResolved(spark, t.root, t.manifest)
      .queryExecution.analyzed
    val byName = child.output.map(a => a.name -> a).toMap
    // alias the resolved read's outputs back onto the relation's
    // attribute ids — the surrounding plan's references re-bind with
    // no further analysis
    val projs = r.output.map { a =>
      val c = byName.getOrElse(a.name, throw new IllegalStateException(
        s"DV read rewrite at ${t.root}: column '${a.name}' missing " +
          "from the resolved manifest read — manifest/relation schema " +
          "drift"))
      Alias(c, a.name)(exprId = a.exprId, qualifier = a.qualifier,
        explicitMetadata = Some(a.metadata))
    }
    Project(projs, child)
  }
}
