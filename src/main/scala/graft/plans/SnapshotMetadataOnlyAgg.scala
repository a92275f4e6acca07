package graft.plans

import graft.etl.SnapshotStore
import graft.sources.GraftSnapshotTable
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, ExprId, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, OneRowRelation, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types._

/** METADATA-ONLY AGGREGATES — answer whole-table `COUNT(*)` / `MIN` /
  * `MAX` over a snapshot table from the manifest's per-entry
  * statistics, without scanning a single data file. At 100 TB this is
  * the difference between a sub-millisecond driver lookup and a
  * full-corpus scan for the most common sanity queries a pipeline
  * runs (`SELECT count(*) FROM t`, watermark probes like
  * `SELECT max(event_ts) FROM t`). Delta Lake ships the same rewrite
  * as `OptimizeMetadataOnlyDeltaQuery`; Iceberg answers these from
  * manifest files. (Reference analogue: ClickHouse's
  * `optimize_trivial_count_query` serving `count()` from part
  * metadata — README.md:606's Q1 count family.)
  *
  * Safety rules, each load-bearing:
  *   - `COUNT(*)`/`COUNT(lit)` (no DISTINCT, no FILTER) = Σ live rows.
  *     EXACT even on deletion-vector-bearing tables: every entry's
  *     stats row count minus its DV position count
  *     ([[SnapshotStore.liveRows]]) — which is why this rule is
  *     injected BEFORE [[SnapshotDvReadRewrite]] (after it, the
  *     relation is already a scan+anti-join plan).
  *   - `MIN`/`MAX(col)` only when NO entry carries a deletion vector
  *     (the vector may have deleted the extremal row), EVERY non-empty
  *     entry has a harvested stat for the column (a missing stat means
  *     all-null-or-dropped — indistinguishable, so the scan answers),
  *     and the column type is a [[SnapshotStore.supportedStatType]].
  *     Stat strings are the engine's own canonical renderings
  *     ([[SnapshotStore.statString]]) reduced under
  *     [[SnapshotStore.statCompare]] — the same total order the
  *     pruning paths already bet correctness on.
  *   - Only `Aggregate` over a bare relation (through `SubqueryAlias`
  *     / attribute-only `Project`s). A `WHERE` clause is allowed
  *     EXACTLY when every entry decides it UNIFORMLY — exact
  *     true/false on identity partition components (constant,
  *     non-null), or no-row-matches through the range pruner — so
  *     `count(*) WHERE order_month = 'x'` is two manifest lookups; a
  *     row-mixing predicate disqualifies the plan. Grouping is allowed
  *     EXACTLY when every grouping expression is an IDENTITY
  *     partition column of every entry's spec vintage — entries then
  *     group precisely (per-entry constant, provably non-null), with
  *     group keys read from the entries' own TYPED stats rather than
  *     the token strings (no timestamp/float rendering ambiguity).
  *   - Renamed columns need no translation: entry stats are keyed by
  *     LOGICAL names (the write path re-keys footer stats, RENAME
  *     migrates the keys) — exactly what the relation's attributes
  *     spell.
  *   - Time travel / branch reads are automatically correct: the
  *     relation's table instance pins the exact manifest that read
  *     resolved.
  *
  * Scope deliberately NOT taken: `COUNT(col)` (per-entry null counts
  * are not harvested), grouping by non-identity expressions (no exact
  * entry↔group attribution), per-aggregate FILTER clauses, WHERE
  * clauses any entry straddles. All fall through to the ordinary
  * scan.
  *
  * Disable with `spark.graft.agg.metadataOnly=false` (A/B hook for
  * the plan audit and an escape hatch if a stats regression is ever
  * suspected in production).
  */
object SnapshotMetadataOnlyAgg extends Rule[LogicalPlan] {

  private val ConfKey = "spark.graft.agg.metadataOnly"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (conf.getConfString(ConfKey, "true") != "true") return plan
    plan.transformUpWithSubqueries {
      // `resolved` is load-bearing: post-hoc resolution also sees
      // plans that FAILED main resolution (the analyzer surfaces the
      // error afterwards) — rewriting around an unresolved aggregate
      // would garble that error into a half-folded plan
      case agg @ Aggregate(Nil, _, child, _) if agg.resolved =>
        unwrap(child) match {
          case Some((table, names, conds)) =>
            selectEntries(table, conds)
              .flatMap(es => tryAnswer(agg, es, names))
              .getOrElse(agg)
          case None => agg
        }
      // PARTITION-GRAIN rollups: GROUP BY over IDENTITY partition
      // columns — entries group exactly by their (non-null, per-entry
      // constant) component values, so per-group COUNT/MIN/MAX are as
      // answerable as the global ones (`SELECT month, count(*) …
      // GROUP BY month` — the single most common operational rollup)
      case agg @ Aggregate(groupExprs, _, child, _)
          if agg.resolved && groupExprs.nonEmpty &&
            groupExprs.forall(_.isInstanceOf[AttributeReference]) =>
        unwrap(child) match {
          case Some((table, names, conds)) =>
            selectEntries(table, conds)
              .flatMap(es => tryAnswerGrouped(agg, table, es, names))
              .getOrElse(agg)
          case None => agg
        }
    }
  }

  /** A Filter condition found on the way down, paired with the
    * exprId→relation-column map IN SCOPE at its level (a Project above
    * it may rename further; the pair stays bound to its own scope). */
  private type Cond =
    (org.apache.spark.sql.catalyst.expressions.Expression,
      Map[ExprId, String])

  /** Walk down through alias/pruning/filter layers to a snapshot
    * relation, composing the exprId → relation-column-name map and
    * collecting Filter conditions. Anything else (a Join, an
    * expression-bearing Project) disqualifies. */
  private def unwrap(p: LogicalPlan)
      : Option[(GraftSnapshotTable, Map[ExprId, String], Seq[Cond])] =
    p match {
      case SubqueryAlias(_, c) => unwrap(c)
      case org.apache.spark.sql.catalyst.plans.logical.Filter(cond, c) =>
        unwrap(c).map { case (t, inner, conds) =>
          (t, inner, conds :+ (cond, inner))
        }
      case Project(projList, c)
          if projList.forall {
            case _: AttributeReference => true
            case Alias(_: AttributeReference, _) => true
            case _ => false
          } =>
        // re-expressed per level on the way OUT: first reach the
        // relation, then names are relation-attr names — so here just
        // recurse and translate project outputs afterwards
        unwrap(c).map { case (t, inner, conds) =>
          val thisLevel = projList.map {
            case ar: AttributeReference => ar.exprId -> inner.get(ar.exprId)
            case a @ Alias(ar: AttributeReference, _) =>
              a.exprId -> inner.get(ar.exprId)
          }.collect { case (id, Some(n)) => id -> n }.toMap
          (t, thisLevel, conds)
        }
      case r: DataSourceV2Relation =>
        r.table match {
          // LIVE EQUALITY DELETES make every stat-derived answer
          // data-dependent (how many older rows a key displaces is
          // unknowable from the manifest — unlike DV counts, which
          // are recorded exactly). Fall back to the scan; the
          // resolved-read rewrite makes it correct.
          case t: GraftSnapshotTable if !t.hasEqDeletes =>
            Some((t, r.output.map(a => a.exprId -> a.name).toMap, Nil))
          case _ => None
        }
      case _ => None
    }

  /** The manifest entries a conjunction of Filter conditions selects
    * UNIFORMLY — every entry must decide wholly in or wholly out
    * ([[graft.sources.GraftStatsPrune.decideUniform]]: exact on
    * identity components, no-row-matches through the range pruner).
    * `WHERE order_month = '1997-06'` thus answers `count(*)` from two
    * manifest lookups; a row-mixing predicate falls back to the scan.
    * Conditions are translated to source filters under THEIR OWN name
    * scope; anything untranslatable bails. */
  private def selectEntries(t: GraftSnapshotTable, conds: Seq[Cond])
      : Option[Seq[SnapshotStore.Entry]] = {
    val m = t.manifest
    if (conds.isEmpty) return Some(m.entries)
    if (m.entries.exists(_.stats.isEmpty)) return None
    val types: Map[String, DataType] =
      m.schema.map(_.fields.map(f => f.name -> f.dataType).toMap)
        .getOrElse(return None)
    val filters = conds.map { case (expr, names) =>
      val renamed = expr.transform {
        case ar: AttributeReference =>
          ar.withName(names.getOrElse(ar.exprId, return None))
      }
      // post-hoc resolution runs before ConstantFolding: a mixed-type
      // literal still wears its analyzer cast (`id > CAST(99999 AS
      // BIGINT)`), which the source-filter translator refuses — fold
      // deterministic foldables down to literals first
      val folded = renamed.transformUp {
        case e if e.foldable && e.deterministic &&
            !e.isInstanceOf[Literal] =>
          try Literal.create(e.eval(
            org.apache.spark.sql.catalyst.InternalRow.empty), e.dataType)
          catch { case scala.util.control.NonFatal(_) => return None }
      }
      org.apache.spark.sql.GraftPlanBridge.translateFilter(folded)
        .getOrElse(return None)
    }
    val currentSpec = SnapshotStore.tableLayout(m)
      .map(l => SnapshotStore.parseSpec(l._1)).getOrElse(return None)
    val selected = m.entries.filter { e =>
      val spec = e.spec.map { s =>
        try SnapshotStore.parseSpec(s)
        catch { case _: IllegalArgumentException => return None }
      }.getOrElse(currentSpec)
      val st = e.stats.get
      // identity components valued by their canonical stat strings
      // (per-entry constant; min==max or the component is excluded and
      // its leaves fall to the range pruner)
      val const: Map[String, String] = spec.fields.collect {
        case graft.etl.PartitionSpec.Identity(c) => c
      }.flatMap { c =>
        for {
          dt <- types.get(c)
          if SnapshotStore.supportedStatType(dt)
          cs <- st.cols.get(c)
          if SnapshotStore.statCompare(dt, cs.min, cs.max) == 0
        } yield c -> cs.min
      }.toMap
      filters.forall(f =>
        graft.sources.GraftStatsPrune
          .decideUniform(st, const, types, f)
          .getOrElse(return None))
    }
    Some(selected)
  }

  private def tryAnswer(agg: Aggregate,
      entries: Seq[SnapshotStore.Entry],
      names: Map[ExprId, String]): Option[LogicalPlan] = {
    // every entry must carry write-time stats (pre-stats-era tables
    // answer by scan); ALL embedded AggregateExpressions must be
    // answerable or the plan stands
    if (entries.exists(_.stats.isEmpty)) return None
    val found = answerAll(agg.aggregateExpressions, entries, names)
      .getOrElse(return None)
    if (found.isEmpty) return None

    val newExprs = agg.aggregateExpressions.map(ne =>
      ne.transform {
        case ae: AggregateExpression => found(ae)
      }.asInstanceOf[NamedExpression])
    Some(Project(newExprs, OneRowRelation()))
  }

  /** All AggregateExpressions inside `exprs` answered over `entries`,
    * or None if any is unanswerable. */
  private def answerAll(exprs: Seq[NamedExpression],
      entries: Seq[SnapshotStore.Entry],
      names: Map[ExprId, String])
      : Option[scala.collection.mutable.LinkedHashMap[
        AggregateExpression, Literal]] = {
    val anyDv = entries.exists(_.dv.isDefined)
    val found = scala.collection.mutable.LinkedHashMap
      .empty[AggregateExpression, Literal]
    var ok = true
    exprs.foreach(_.foreach {
      case ae: AggregateExpression if ok && !found.contains(ae) =>
        answerOne(ae, entries, names, anyDv) match {
          case Some(lit) => found(ae) = lit
          case None => ok = false
        }
      case _ => ()
    })
    if (ok) Some(found) else None
  }

  /** GROUP BY identity-partition-columns: every entry belongs to
    * exactly one group (identity components are per-entry constant and
    * provably non-null — the commit guard refuses null partition
    * values), read from the entry's own stats (min==max for an
    * identity column; also the TYPED canonical rendering, so the
    * token-string parse ambiguities of timestamps/floats never
    * arise). Entries of EVERY spec vintage qualify as long as their
    * own spec carries the grouped columns as identity components.
    * rows==0 entries contribute to no group. Empty table → zero
    * groups, exactly the scan's semantics. */
  private def tryAnswerGrouped(agg: Aggregate, t: GraftSnapshotTable,
      selected: Seq[SnapshotStore.Entry],
      names: Map[ExprId, String]): Option[LogicalPlan] = {
    import org.apache.spark.sql.catalyst.InternalRow
    val m = t.manifest
    if (selected.exists(_.stats.isEmpty)) return None
    val groupAttrs = agg.groupingExpressions
      .map(_.asInstanceOf[AttributeReference])
    val groupCols = groupAttrs.map(a =>
      names.get(a.exprId).getOrElse(return None))
    // every entry's EFFECTIVE spec must carry every grouped column as
    // an identity component
    val currentSpec = SnapshotStore.tableLayout(m)
      .map(l => SnapshotStore.parseSpec(l._1)).getOrElse(return None)
    val entries = selected.filter(_.stats.exists(_.rows > 0))
    val keyed: Seq[(Seq[String], SnapshotStore.Entry)] = entries.map { e =>
      val spec = e.spec.map { s =>
        try SnapshotStore.parseSpec(s)
        catch { case _: IllegalArgumentException => return None }
      }.getOrElse(currentSpec)
      val identity = spec.fields.collect {
        case graft.etl.PartitionSpec.Identity(c) => c
      }.toSet
      if (!groupCols.forall(identity.contains)) return None
      val st = e.stats.get
      val key = groupCols.map { c =>
        val cs = st.cols.getOrElse(c, return None)
        // identity ⇒ constant per entry; a violated invariant means
        // the stats can't be trusted for grouping — fall back
        val dt = groupAttrs(groupCols.indexOf(c)).dataType
        if (!SnapshotStore.supportedStatType(dt) ||
          SnapshotStore.statCompare(dt, cs.min, cs.max) != 0) return None
        cs.min
      }
      key -> e
    }
    val outRows = keyed.groupBy(_._1).toSeq.sortBy(_._1.mkString(" "))
      .map { case (key, ke) =>
        val es = ke.map(_._2)
        val keyLit: Map[ExprId, Literal] =
          groupAttrs.zip(key).map { case (a, ks) =>
            a.exprId -> toLiteral(a.dataType, ks).getOrElse(return None)
          }.toMap
        val found = answerAll(agg.aggregateExpressions, es, names)
          .getOrElse(return None)
        val vals = agg.aggregateExpressions.map { ne =>
          val stripped = ne match {
            case Alias(c, _) => c
            case other => other
          }
          val substituted = stripped.transform {
            case ae: AggregateExpression => found(ae)
            case ar: AttributeReference =>
              keyLit.getOrElse(ar.exprId, return None)
          }
          if (!substituted.foldable || !substituted.deterministic)
            return None
          try substituted.eval(InternalRow.empty)
          catch { case scala.util.control.NonFatal(_) => return None }
        }
        InternalRow.fromSeq(vals)
      }
    Some(org.apache.spark.sql.catalyst.plans.logical.LocalRelation(
      agg.output, outRows))
  }

  private def answerOne(ae: AggregateExpression,
      entries: Seq[SnapshotStore.Entry],
      names: Map[ExprId, String],
      anyDv: Boolean): Option[Literal] = {
    if (ae.filter.isDefined) return None
    ae.aggregateFunction match {
      case Count(Seq(l: Literal)) if !ae.isDistinct && l.value != null =>
        Some(Literal(entries
          .map(e => SnapshotStore.liveRows(e)
            .getOrElse(return None)).sum))
      case Min(ar: AttributeReference) =>
        minMax(ar, pickMin = true, entries, names, anyDv)
      case Max(ar: AttributeReference) =>
        minMax(ar, pickMin = false, entries, names, anyDv)
      case _ => None
    }
  }

  private def minMax(ar: AttributeReference, pickMin: Boolean,
      entries: Seq[SnapshotStore.Entry],
      names: Map[ExprId, String],
      anyDv: Boolean): Option[Literal] = {
    if (anyDv) return None // a DV may have deleted the extremal row
    val dt = ar.dataType
    if (!SnapshotStore.supportedStatType(dt)) return None
    // entry stats are keyed by LOGICAL column names (the write path
    // re-keys footer stats; RENAME migrates the keys)
    val logical = names.get(ar.exprId).getOrElse(return None)
    val stats = entries.map(_.stats.get)
    val nonEmpty = stats.filter(_.rows > 0)
    if (nonEmpty.isEmpty)
      return Some(Literal.create(null, dt)) // empty table: SQL NULL
    val cols = nonEmpty.map(_.cols.get(logical))
    // a rows>0 entry without the stat is all-null-or-dropped: bail
    if (cols.exists(_.isEmpty)) return None
    val strs = cols.map(_.get).map(cs => if (pickMin) cs.min else cs.max)
    val best = strs.reduce { (a, b) =>
      val c = SnapshotStore.statCompare(dt, a, b)
      if ((pickMin && c <= 0) || (!pickMin && c >= 0)) a else b
    }
    toLiteral(dt, best)
  }

  /** Reparse a canonical stat string as a typed literal. Every branch
    * is the exact inverse of the rendering in
    * [[SnapshotStore.harvestStats]]'s `conv` / [[SnapshotStore.statString]]
    * (integral toString, Float/Double toString — both round-trip
    * exactly in Java — LocalDate/Instant/LocalDateTime ISO-8601,
    * BigDecimal plain string). An unparseable string (corrupt
    * manifest) falls back to the scan rather than failing the query. */
  private def toLiteral(dt: DataType, s: String): Option[Literal] =
    try {
      val ext: Any = dt match {
        case ByteType => s.toByte
        case ShortType => s.toShort
        case IntegerType => s.toInt
        case LongType => s.toLong
        case FloatType => s.toFloat
        case DoubleType => s.toDouble
        case StringType => s
        case BooleanType => s.toBoolean
        case DateType => java.time.LocalDate.parse(s)
        case TimestampType => java.time.Instant.parse(s)
        case TimestampNTZType => java.time.LocalDateTime.parse(s)
        case _: DecimalType => new java.math.BigDecimal(s)
        case _ => return None
      }
      Some(Literal.create(ext, dt))
    } catch { case scala.util.control.NonFatal(_) => None }
}
