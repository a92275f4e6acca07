package graft.etl

import graft.etl.SnapshotStore.{ColStats, Manifest}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.types.DataType

/** Manifest-stats pruning for ARBITRARY predicates — the Iceberg-style
  * min/max skip generalized from MERGE's key-range prune
  * ([[graft.operators.MergeInto.candidatePartitions]], which prunes on
  * one equi-key's min/max) to the WHERE clauses row-level UPDATE and
  * DELETE carry: the predicate is translated to V1 `sources.Filter`s
  * with the planner's own translation (so this can never reason about
  * a different predicate than the scan executes) and each conjunct is
  * evaluated against every entry's per-column min/max. An entry
  * survives unless some conjunct is PROVABLY false over its whole
  * range — unknown always keeps (stats-less entries, untranslatable
  * conjuncts, null-sensitive filters), so a prune can cost only
  * skipped work, never correctness.
  *
  * At 100 TB this is what turns `UPDATE t SET … WHERE ts BETWEEN a
  * AND b` discovery from a full-table scan into a scan of the months
  * whose stats ranges intersect [a, b] — decided on the ~KB manifest
  * before any file listing. */
object StatsPruning {

  /** The RESOLVED filter predicate `cond` applies to `base` — read off
    * the analyzed plan, so attribute binding (and any rebind-by-name
    * the SQL commands do) has already happened. */
  private def resolvedPredicate(base: DataFrame, cond: Column)
      : Option[org.apache.spark.sql.catalyst.expressions.Expression] =
    base.filter(cond).queryExecution.analyzed.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        f.condition
    }

  private def conjuncts(
      e: org.apache.spark.sql.catalyst.expressions.Expression)
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] =
    e match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
        conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }

  /** Entry VALUES whose stats ranges could satisfy `cond`; None =
    * pruning unavailable (no schema, or nothing translatable). The
    * result is a SUPERSET of the matching partitions by construction. */
  private[graft] def candidateValues(m: Manifest, base: DataFrame,
      cond: Column): Option[Set[String]] = {
    val schema = m.schema.getOrElse(return None)
    val types: Map[String, DataType] =
      schema.fields.map(f => f.name -> f.dataType).toMap
    val pred = resolvedPredicate(base, cond).getOrElse(return None)
    val filters = conjuncts(pred)
      .flatMap(c => org.apache.spark.sql.GraftPlanBridge.translateFilter(c))
    if (filters.isEmpty) return None
    Some(m.entries.filter { e =>
      val stats = e.stats.map(_.cols).getOrElse(Map.empty)
      filters.forall(f => possible(f, stats, types))
    }.map(_.value).toSet)
  }

  /** Could `f` hold for SOME row of an entry with these column stats?
    * Three-valued logic collapsed to Boolean: unknown = true (keep). */
  private def possible(f: org.apache.spark.sql.sources.Filter,
      stats: Map[String, ColStats],
      types: Map[String, DataType]): Boolean = {
    import org.apache.spark.sql.sources._
    // comparable (type, stat-range) for a column — None = no evidence
    def range(col: String): Option[(DataType, ColStats)] =
      for {
        t <- types.get(col) if SnapshotStore.supportedStatType(t)
        cs <- stats.get(col)
      } yield (t, cs)
    def cmp(t: DataType, a: String, b: String): Int =
      SnapshotStore.statCompare(t, a, b)
    def s(v: Any): String = SnapshotStore.statString(v)
    // a filter VALUE whose rendered form cannot be compared under the
    // column type (cross-type pushdown, exotic literal) keeps the entry
    def safely(b: => Boolean): Boolean =
      try b catch { case _: Exception => true }
    f match {
      case EqualTo(c, v) if v != null => range(c).forall { case (t, cs) =>
        safely(cmp(t, cs.min, s(v)) <= 0 && cmp(t, cs.max, s(v)) >= 0) }
      case EqualNullSafe(c, v) if v != null =>
        range(c).forall { case (t, cs) =>
          safely(cmp(t, cs.min, s(v)) <= 0 && cmp(t, cs.max, s(v)) >= 0) }
      case In(c, vs) if vs != null && vs.forall(_ != null) =>
        range(c).forall { case (t, cs) => safely(vs.exists(v =>
          cmp(t, cs.min, s(v)) <= 0 && cmp(t, cs.max, s(v)) >= 0)) }
      case GreaterThan(c, v) if v != null =>
        range(c).forall { case (t, cs) => safely(cmp(t, cs.max, s(v)) > 0) }
      case GreaterThanOrEqual(c, v) if v != null =>
        range(c).forall { case (t, cs) => safely(cmp(t, cs.max, s(v)) >= 0) }
      case LessThan(c, v) if v != null =>
        range(c).forall { case (t, cs) => safely(cmp(t, cs.min, s(v)) < 0) }
      case LessThanOrEqual(c, v) if v != null =>
        range(c).forall { case (t, cs) => safely(cmp(t, cs.min, s(v)) <= 0) }
      // possible(l ∧ r) ⊆ possible(l) ∧ possible(r): prune if either
      // side is impossible — sound for conjunctions nested under Or
      case And(l, r) => possible(l, stats, types) && possible(r, stats, types)
      case Or(l, r) => possible(l, stats, types) || possible(r, stats, types)
      // IsNull/IsNotNull/Not/string matches/null-valued comparisons:
      // stats carry no null counts and negation inverts intervals
      // unsafely — keep the entry
      case _ => true
    }
  }

  /** Discovery source for a row-level mutation: the stats-surviving
    * partitions of the current table, or the full `base` read when
    * pruning has no evidence. `Some(empty)` means NO entry can match —
    * the caller skips the scan entirely. */
  private[graft] def discoveryFrame(spark: org.apache.spark.sql.SparkSession,
      root: String, m: Manifest, base: DataFrame, cond: Column)
      : (DataFrame, Boolean) =
    candidateValues(m, base, cond) match {
      case Some(c) if c.size < m.entries.map(_.value).toSet.size =>
        (SnapshotStore.readWhere(spark, root, c), true)
      case _ => (base, false)
    }
}
