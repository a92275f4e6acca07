package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.GraftPlanBridge
import org.apache.spark.sql.functions._

/** Optimizer-rule tier: the naive `abs(t_a − t_b) <= tol` non-equi join
  * must be rewritten into a bucketized hash join with identical results
  * — including exact-tolerance pairs, pairs straddling bucket
  * boundaries, negative times (the truncating-division double-width
  * zero bucket), and null times. Expected results are computed in plain
  * Scala, independent of any Spark join strategy. */
class ProximityJoinRewriteSpec extends SparkSpec {

  import spark.implicits._

  private val tol = 10L

  // negatives + zero probe the trunc-division zero bucket; -15/-9 and
  // 19/21 straddle bucket boundaries; (7,10)... hit |Δ| < tol; (-25,-15)
  // and (11,21) sit at EXACTLY tol; 45 pairs with nothing; 100/110/121
  // chain with one in-tol and one out-of-tol link
  private val times = Seq(
    1L -> -25L, 2L -> -15L, 3L -> -9L, 4L -> -1L, 5L -> 0L,
    6L -> 7L, 7L -> 10L, 8L -> 19L, 9L -> 21L, 10L -> 45L,
    11L -> 100L, 12L -> 110L, 13L -> 121L)

  private def expected: Set[(Long, Long, Long)] = (for {
    (ia, ta) <- times; (ib, tb) <- times
    if ia < ib && math.abs(ta - tb) <= tol
  } yield (ia, ib, tb - ta)).toSet

  private def naiveJoin: DataFrame = {
    GraftPlanBridge.ensureOptimizerRule(
      spark, ProximityJoinRewrite.RewriteRule)
    val e = times.toDF("id", "t")
    val a = e.select(col("id").as("id_a"), col("t").as("t_a"))
    val b = e.select(col("id").as("id_b"), col("t").as("t_b"))
    a.join(b, col("id_a") < col("id_b") &&
        abs(col("t_a") - col("t_b")) <= lit(tol))
      .select(col("id_a"), col("id_b"), (col("t_b") - col("t_a")).as("dt_us"))
  }

  test("rewrite preserves naive semantics (exact tol, boundaries, negatives)") {
    val got = naiveJoin.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expected)
    assert(got.contains((1L, 2L, 10L)))  // exactly tol apart
    assert(got.contains((2L, 3L, 6L)))   // buckets -2 / -1
    assert(!got.contains((12L, 13L, 11L))) // one past tol
  }

  test("rewritten plan: bucketized hash join, no nested-loop/cartesian") {
    val df = naiveJoin
    assert(df.queryExecution.optimizedPlan.toString
      .contains(ProximityJoinRewrite.marker))
    df.collect()
    val phys = df.queryExecution.executedPlan.toString
    assert(!phys.contains("BroadcastNestedLoop"))
    assert(!phys.contains("CartesianProduct"))
  }

  test("null times never pair (inner-join drop matches naive predicate)") {
    GraftPlanBridge.ensureOptimizerRule(
      spark, ProximityJoinRewrite.RewriteRule)
    val e = Seq((1L, Some(5L)), (2L, None), (3L, Some(8L)))
      .toDF("id", "t")
    val a = e.select(col("id").as("id_a"), col("t").as("t_a"))
    val b = e.select(col("id").as("id_b"), col("t").as("t_b"))
    val got = a.join(b, col("id_a") < col("id_b") &&
        abs(col("t_a") - col("t_b")) <= lit(tol))
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 3L)))
  }

  test("extra equi conjuncts survive the rewrite") {
    GraftPlanBridge.ensureOptimizerRule(
      spark, ProximityJoinRewrite.RewriteRule)
    val e = Seq((1L, "x", 0L), (2L, "x", 5L), (3L, "y", 6L), (4L, "y", 9L))
      .toDF("id", "k", "t")
    val a = e.select(col("id").as("id_a"), col("k").as("k_a"),
      col("t").as("t_a"))
    val b = e.select(col("id").as("id_b"), col("k").as("k_b"),
      col("t").as("t_b"))
    val got = a.join(b, col("k_a") === col("k_b") &&
        col("id_a") < col("id_b") &&
        abs(col("t_a") - col("t_b")) <= lit(tol))
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // (2,3) is within tol but crosses keys x/y — must be excluded
    assert(got === Set((1L, 2L), (3L, 4L)))
  }

  test("rule is a no-op on joins it does not understand") {
    GraftPlanBridge.ensureOptimizerRule(
      spark, ProximityJoinRewrite.RewriteRule)
    val e = Seq((1L, 2L), (2L, 4L)).toDF("id", "v")
    val a = e.select(col("id").as("id_a"), col("v").as("v_a"))
    val b = e.select(col("id").as("id_b"), col("v").as("v_b"))
    // plain equi join: untouched (no marker in the optimized plan)
    val eq = a.join(b, col("v_a") === col("v_b"))
    assert(!eq.queryExecution.optimizedPlan.toString
      .contains(ProximityJoinRewrite.marker))
    assert(eq.count() === 2L) // each row matches itself on v
  }

  test("literal-on-the-left spelling and strict < are matched too") {
    GraftPlanBridge.ensureOptimizerRule(
      spark, ProximityJoinRewrite.RewriteRule)
    val e = times.toDF("id", "t")
    val a = e.select(col("id").as("id_a"), col("t").as("t_a"))
    val b = e.select(col("id").as("id_b"), col("t").as("t_b"))
    val strict = a.join(b, col("id_a") < col("id_b") &&
        abs(col("t_a") - col("t_b")) < lit(tol))
      .select("id_a", "id_b")
    assert(strict.queryExecution.optimizedPlan.toString
      .contains(ProximityJoinRewrite.marker))
    val got = strict.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for {
      (ia, ta) <- times; (ib, tb) <- times
      if ia < ib && math.abs(ta - tb) < tol
    } yield (ia, ib)).toSet
    assert(got === want)
  }
}
