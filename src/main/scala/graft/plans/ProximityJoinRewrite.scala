package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Add, Alias, Attribute, AttributeReference, CreateArray, EqualTo, Explode, Expression, GreaterThan, GreaterThanOrEqual, IntegralDivide, LessThan, LessThanOrEqual, Literal, PredicateHelper, Subtract, Cast, Abs}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}

/** Optimizer rule (the `Rule[LogicalPlan]` tier of the custom-extension
  * ladder, SURVEY.md §7.3 preference (c)): rewrites a naive time/value
  * PROXIMITY join — `... JOIN ... ON abs(l.t − r.t) <= tol` — into the
  * bucketized equi-join that [[graft.operators.RangeJoin]] builds by
  * hand, so a user who writes the obvious non-equi predicate gets the
  * scalable plan automatically.
  *
  * Why this matters at 100 TB: with no equi conjunct, Spark can only
  * plan a non-equi join as BroadcastNestedLoopJoin / CartesianProduct —
  * O(|L|·|R|) predicate evaluations and an un-shardable broadcast. The
  * rewrite buckets both sides into tolerance-width cells
  * (`b = t div tol`), explodes the RIGHT side to its own and both
  * adjacent cells, and joins on `bucket(l) = exploded_bucket(r)` with
  * the ORIGINAL predicate kept as a residual filter — a plain hash
  * shuffle join on a key whose cardinality is time_range/tol.
  *
  * Correctness: bucket intervals under truncating division are at least
  * `tol` wide (the zero bucket spans (−tol, tol), all others exactly
  * tol), so any r within `tol` of l lies in l's cell or an adjacent
  * one; each qualifying (l, r) pair meets on exactly ONE cell (l's own
  * — the equi-join keys each pair once, no dedup needed); the residual
  * filter re-applies the exact original predicate, so false candidates
  * from shared cells are dropped. Null times bucket to null and drop
  * from the inner join, matching the naive predicate's null semantics.
  *
  * Scope guards: inner joins only; the proximity operands must be
  * deterministic, integral-typed (callers use `unix_micros` for
  * timestamps), and reference exactly one side each; a positive literal
  * tolerance. Plans already carrying the rewrite's marker columns are
  * skipped — that makes the rule idempotent under the optimizer's
  * fixed-point batches even if a later rule pushes the residual back
  * into the join condition.
  *
  * Registration: `SparkSessionExtensions.injectOptimizerRule` (cluster:
  * `spark.sql.extensions=graft.GraftExtensions`) or per-session via
  * [[org.apache.spark.sql.GraftPlanBridge.ensureOptimizerRule]].
  */
object ProximityJoinRewrite {

  /** Internal column-name prefix; doubles as the idempotence marker. */
  val marker = "__graft_prox_"

  private val integralTypes: Set[DataType] =
    Set(ByteType, ShortType, IntegerType, LongType)

  private def litLong(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
    case s: Short => s.toLong
    case b: Byte => b.toLong
    case other => throw new IllegalStateException(s"non-integral $other")
  }

  /** Matches `abs(x − y) <= tol` in its four spellings (<=, <, and the
    * literal on either side), yielding (x, y, tol). */
  private object Prox {
    def unapply(e: Expression): Option[(Expression, Expression, Long)] =
      e match {
        case LessThanOrEqual(Abs(Subtract(x, y, _), _), Literal(t, dt))
            if integralTypes(dt) => Some((x, y, litLong(t)))
        case LessThan(Abs(Subtract(x, y, _), _), Literal(t, dt))
            if integralTypes(dt) => Some((x, y, litLong(t)))
        case GreaterThanOrEqual(Literal(t, dt), Abs(Subtract(x, y, _), _))
            if integralTypes(dt) => Some((x, y, litLong(t)))
        case GreaterThan(Literal(t, dt), Abs(Subtract(x, y, _), _))
            if integralTypes(dt) => Some((x, y, litLong(t)))
        case _ => None
      }
  }

  object RewriteRule extends Rule[LogicalPlan] with PredicateHelper {

    private def tainted(p: LogicalPlan): Boolean =
      p.output.exists(_.name.startsWith(marker))

    override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
      case j @ Join(l, r, Inner, Some(cond), hint)
          if !tainted(l) && !tainted(r) &&
            !cond.references.exists(_.name.startsWith(marker)) =>
        val conjuncts = splitConjunctivePredicates(cond)
        val found = conjuncts.collectFirst {
          case p @ Prox(x, y, tol)
              if tol > 0 && x.deterministic && y.deterministic &&
                integralTypes(x.dataType) && integralTypes(y.dataType) &&
                x.references.nonEmpty && y.references.nonEmpty &&
                (sided(x, y, l, r) || sided(y, x, l, r)) =>
            val (lt, rt) = if (sided(x, y, l, r)) (x, y) else (y, x)
            (p, lt, rt, tol)
        }
        found match {
          case Some((prox, lt, rt, tol)) =>
            rewrite(j, conjuncts.filterNot(_ eq prox), prox, lt, rt, tol)
          case None => j
        }
    }

    private def sided(a: Expression, b: Expression, l: LogicalPlan,
        r: LogicalPlan): Boolean =
      a.references.subsetOf(l.outputSet) && b.references.subsetOf(r.outputSet)

    /** `t div tol` — truncating integer division; see the scaladoc for
      * why truncation (vs floor) still guarantees adjacency coverage. */
    private def bucket(t: Expression, tol: Long): Expression =
      new IntegralDivide(Cast(t, LongType), Literal(tol))

    private def rewrite(j: Join, keep: Seq[Expression], prox: Expression,
        lt: Expression, rt: Expression, tol: Long): LogicalPlan = {
      val lb = Alias(bucket(lt, tol), marker + "b")()
      val lProj = Project(j.left.output :+ lb, j.left)
      val rb = Alias(bucket(rt, tol), marker + "b0")()
      val rProj = Project(j.right.output :+ rb, j.right)
      val one = Literal(1L)
      val cells = CreateArray(Seq(
        new Subtract(rb.toAttribute, one),
        rb.toAttribute,
        new Add(rb.toAttribute, one)))
      val jb = AttributeReference(marker + "jb", LongType, nullable = true)()
      val gen = Generate(Explode(cells), unrequiredChildIndex = Nil,
        outer = false, qualifier = None, generatorOutput = Seq(jb),
        child = rProj)
      val rOut = Project(j.right.output :+ jb, gen)
      val newCond = (keep :+ (EqualTo(lb.toAttribute, jb): Expression))
        .reduce((a, b) => org.apache.spark.sql.catalyst.expressions.And(a, b))
      val joined = Join(lProj, rOut, Inner, Some(newCond), j.hint)
      Project(j.output, Filter(prox, joined))
    }
  }
}
