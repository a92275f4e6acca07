package graft.plans

import scala.annotation.tailrec

import org.apache.spark.sql.catalyst.expressions.{Alias, BinaryComparison, BloomFilterMightContain, EqualTo, Expression, In, InSet, Literal, PredicateHelper, ScalarSubquery, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, LeafNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: automatic Bloom-filter injection for selective
  * equi-joins — the rule-tier counterpart of the explicit
  * [[graft.operators.RuntimeFilters.bloomPrunedJoin]] operator, so a
  * user who writes the OBVIOUS join against a filtered dimension gets
  * the pruned plan without calling anything. The same idea Spark ships
  * as `InjectRuntimeFilter` (size-threshold-gated and off for
  * already-broadcast joins); this variant demonstrates the mechanism
  * end-to-end through the public extension hooks.
  *
  * Rewrite: for `probe ⋈ σ(build)` on `pk = bk` where the build side is
  * a selectively-filtered scan and smaller than the probe by stats, add
  *   `Filter(might_contain(<scalar-subquery: bloom_agg(xxhash64(bk))
  *    over the filtered build>, xxhash64(pk)), probe)`
  * The subquery runs first as its own tiny job (one extra pass over the
  * filtered build side — the trade every runtime filter makes), its
  * blob broadcasts as a constant into the probe's scan stage, and only
  * candidate rows reach the join's exchange. No false negatives, so
  * results are row-identical; false positives die in the exact join.
  *
  * Guards: inner equi-join; build subtree is a Project/Filter/leaf
  * chain with a likely-selective predicate (comparison/IN against a
  * literal); build stats ≤ `maxBuildBytes` AND strictly smaller than
  * the probe (NOTE: without CBO `ANALYZE` stats `sizeInBytes` is a
  * coarse file-size-derived estimate — a large un-analyzed build scan
  * correctly declines via `maxBuildBytes`, but the relative-size test
  * is only as good as the estimates; run `ANALYZE TABLE` where the
  * rule's choice matters, as `q34_table_stats` does. The full recipe
  * for making collected stats drive PHYSICAL decisions — and the proof
  * they do in this session configuration — is `CboStatsSpec`:
  * `spark.sql.cbo.enabled=true` (off by default) plus
  * `ANALYZE TABLE t COMPUTE STATISTICS FOR COLUMNS <filter cols>`
  * flips a filtered-fact join from sort-merge to broadcast at plan
  * time, and `spark.sql.cbo.joinReorder.enabled=true` additionally
  * reorders multi-join trees once every input has row counts).
  * Idempotence for
  * the fixed-point batch `experimental.extraOptimizations` runs in is
  * scoped PER JOIN: a probe subtree already filtered by
  * `might_contain(..., xxhash64(<same key>))` declines — so one join
  * composed from the explicit [[graft.operators.RuntimeFilters]]
  * operator doesn't stop OTHER eligible joins in the same plan from
  * getting their filter.
  */
object BloomJoinInject {

  val maxBuildBytes: Long = 256L << 20
  val estItems: Long = 1L << 20
  val numBits: Long = 1L << 23

  object InjectRule extends Rule[LogicalPlan] with PredicateHelper {

    /** Probe subtree already carries a Bloom filter on this key —
      * either a previous pass of this rule or an explicit
      * `RuntimeFilters.mightContain` composed by the user. Scoped to
      * (subtree, key) so unrelated joins elsewhere in the plan still
      * get their own injection. */
    private def alreadyInjected(probe: LogicalPlan,
        probeKey: Expression): Boolean =
      probe.exists(_.expressions.exists(_.exists {
        case BloomFilterMightContain(_, h: XxHash64) =>
          h.children.size == 1 && h.children.head.semanticEquals(probeKey)
        case _ => false
      }))

    /** Comparison or membership test against literals — the cheap
      * syntactic stand-in for "this filter drops most rows". */
    private def likelySelective(e: Expression): Boolean = e match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
        likelySelective(l) || likelySelective(r)
      case c: BinaryComparison =>
        c.left.isInstanceOf[Literal] || c.right.isInstanceOf[Literal]
      case In(_, list) => list.forall(_.isInstanceOf[Literal])
      case _: InSet => true
      case org.apache.spark.sql.catalyst.expressions.StartsWith(_, Literal(_, _)) => true
      case _ => false
    }

    /** Build side must be a plain filtered scan: Project/Filter chain
      * over a leaf, with at least one likely-selective filter. */
    @tailrec private def selectiveScan(p: LogicalPlan,
        seen: Boolean = false): Boolean = p match {
      case Project(_, c) => selectiveScan(c, seen)
      case Filter(cond, c) => selectiveScan(c, seen || likelySelective(cond))
      case _: LeafNode => seen
      case _ => false
    }

    override def apply(plan: LogicalPlan): LogicalPlan =
      plan.transformUp {
        case j @ Join(l, r, Inner, Some(cond), _) =>
          val keys = splitConjunctivePredicates(cond).collectFirst {
            case EqualTo(a, b) if a.references.subsetOf(l.outputSet) &&
                b.references.subsetOf(r.outputSet) => (a, b)
            case EqualTo(a, b) if b.references.subsetOf(l.outputSet) &&
                a.references.subsetOf(r.outputSet) => (b, a)
          }
          keys match {
            case Some((lk, rk)) if eligible(r, l) && !alreadyInjected(l, lk) =>
              j.copy(left = inject(l, lk, r, rk))
            case Some((lk, rk)) if eligible(l, r) && !alreadyInjected(r, rk) =>
              j.copy(right = inject(r, rk, l, lk))
            case _ => j
          }
      }

    private def eligible(build: LogicalPlan, probe: LogicalPlan): Boolean =
      selectiveScan(build) &&
        build.stats.sizeInBytes <= maxBuildBytes &&
        build.stats.sizeInBytes < probe.stats.sizeInBytes

    private def inject(probe: LogicalPlan, probeKey: Expression,
        build: LogicalPlan, buildKey: Expression): LogicalPlan = {
      val bloomAgg = Aggregate(Nil,
        Seq(Alias(new BloomFilterAggregate(new XxHash64(Seq(buildKey)),
          Literal(estItems), Literal(numBits)).toAggregateExpression(),
          "__graft_bloom")()),
        build)
      Filter(BloomFilterMightContain(ScalarSubquery(bloomAgg),
        new XxHash64(Seq(probeKey))), probe)
    }
  }
}
