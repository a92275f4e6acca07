package graft.plans

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Native as-of join (custom LogicalPlan + Strategy + merge exec):
  * hand-fixture semantics, null handling, key-boundary state reset,
  * and full equivalence with the compositional operator on real data. */
class AsOfJoinNativeSpec extends SparkSpec {

  import spark.implicits._

  private def trades = Seq(
    // (id, key, t)
    (1L, 10L, 100L), (2L, 10L, 205L), (3L, 10L, 300L),
    (4L, 20L, 50L), (5L, 20L, 400L),
    (6L, 30L, 10L), // key with no right rows at all
  ).toDF("id", "key", "t")

  private def quotes = Seq(
    // (qkey, qt, px)
    (10L, 100L, 1.0), (10L, 200L, 2.0), (10L, 250L, 3.0),
    (20L, 60L, 9.0),
    (40L, 5L, 7.0), // right-only key, must be skipped over
  ).toDF("qkey", "qt", "px")

  private def runNative = AsOfJoinNative.leftAsOf(
    trades, quotes, "key", "qkey", "t", "qt", Seq("px"))
    .select("id", "px").collect()
    .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null
      else Double.box(r.getDouble(1)))).toMap

  test("backward semantics: latest quote at or before each trade") {
    val got = runNative
    assert(got(1L) === 1.0) // exact-time match included (qt <= t)
    assert(got(2L) === 2.0) // 205 -> quote at 200, not 250
    assert(got(3L) === 3.0) // 300 -> latest (250)
    assert(got(4L) === null) // 50 < first quote (60)
    assert(got(5L) === 9.0)
    assert(got(6L) === null) // key 30 never quoted; key 40 skipped over
  }

  test("forward semantics: earliest quote at or after each trade") {
    val got = AsOfJoinNative.leftAsOf(trades, quotes,
      "key", "qkey", "t", "qt", Seq("px"), direction = "forward")
      .select("id", "px").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null
        else Double.box(r.getDouble(1)))).toMap
    assert(got(1L) === 1.0) // exact-time match included (qt >= t)
    assert(got(2L) === 3.0) // 205 -> next quote at 250
    assert(got(3L) === null) // nothing after 300
    assert(got(4L) === 9.0) // 50 -> quote at 60
    assert(got(5L) === null)
    assert(got(6L) === null)
  }

  test("tolerance disqualifies distant matches in both directions") {
    val back = AsOfJoinNative.leftAsOf(trades, quotes,
      "key", "qkey", "t", "qt", Seq("px"), tolerance = Some(10L))
      .select("id", "px").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null
        else Double.box(r.getDouble(1)))).toMap
    assert(back(1L) === 1.0) // dt = 0
    assert(back(2L) === 2.0) // dt = 5 <= 10
    assert(back(3L) === null) // dt = 50 > 10
    val fwd = AsOfJoinNative.leftAsOf(trades, quotes,
      "key", "qkey", "t", "qt", Seq("px"), direction = "forward",
      tolerance = Some(10L))
      .select("id", "px").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null
        else Double.box(r.getDouble(1)))).toMap
    assert(fwd(4L) === 9.0) // dt = 10 <= 10
    assert(fwd(2L) === null) // next quote 45 away
  }

  test("null keys/times never match and never poison the merge state") {
    val t = Seq((1L, Option(10L), Option(100L)), (2L, None, Option(100L)),
      (3L, Option(10L), None)).toDF("id", "key", "t")
    val q = Seq((Option(10L), Option(50L), 1.0),
      (Option(10L), None, 8.0), (None, Option(40L), 9.0))
      .toDF("qkey", "qt", "px")
    val got = AsOfJoinNative.leftAsOf(t, q, "key", "qkey", "t", "qt",
      Seq("px")).select("id", "px").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null
        else Double.box(r.getDouble(1)))).toMap
    assert(got(1L) === 1.0) // only the non-null quote matches
    assert(got(2L) === null) // null left key
    assert(got(3L) === null) // null left time
  }

  test("plan uses the custom exec: no window, no union, no join node") {
    val df = AsOfJoinNative.leftAsOf(
      trades, quotes, "key", "qkey", "t", "qt", Seq("px"))
    df.queryExecution.toRdd.foreach(_ => ())
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.toString
      case o => o.toString
    }
    // TreeNode.nodeName strips the "Exec" suffix in plan strings
    assert(plan.contains("AsOfJoin"), plan)
    assert(!plan.contains("Window"), "no window state")
    assert(!plan.contains("Union"), "no union materialization")
  }

  test("mismatched key/time types fail fast, not silently") {
    val l = Seq((1L, "k", 10L)).toDF("id", "key", "t")
    val r = Seq((5L, 10L, 1.0)).toDF("qkey", "qt", "px")
    val e = intercept[IllegalArgumentException] {
      AsOfJoinNative.leftAsOf(l, r, "key", "qkey", "t", "qt", Seq("px"))
    }
    assert(e.getMessage.contains("key types differ"))
    val e2 = intercept[IllegalArgumentException] {
      AsOfJoinNative.leftAsOf(l.select(col("id"), col("id").as("key2"),
        col("t")), r.select(col("qkey"), col("qt").cast("int").as("qt"),
        col("px")), "key2", "qkey", "t", "qt", Seq("px"))
    }
    assert(e2.getMessage.contains("time types differ"))
  }

  test("equals the compositional operator on real events x orders") {
    val sfDir = sf()
    val events = Tables.events(spark, sfDir)
      .select("event_id", "user_id", "ts")
    val orders = Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderdate").cast("timestamp")
        .as("o_ts"), col("o_orderkey"))
    // dedup right per (key, time): keep max orderkey (both impls need
    // a deterministic right side; ties resolve last-in-sort-order)
    import org.apache.spark.sql.expressions.Window
    val rd = orders.withColumn("rn", row_number().over(Window
        .partitionBy("o_custkey", "o_ts")
        .orderBy(col("o_orderkey").desc)))
      .filter(col("rn") === 1).drop("rn")
    val native = AsOfJoinNative.leftAsOf(events, rd,
      "user_id", "o_custkey", "ts", "o_ts", Seq("o_orderkey"))
      .select("event_id", "o_orderkey")
    val comp = graft.operators.AsOfJoin.leftAsOf(events, rd,
      "user_id", "o_custkey", "ts", "o_ts", Seq("o_orderkey"))
      .select("event_id", "o_orderkey")
    assert(native.count() === events.count())
    assert(native.exceptAll(comp).count() === 0)
    assert(comp.exceptAll(native).count() === 0)
    // forward direction against the compositional forward form
    val nativeFwd = AsOfJoinNative.leftAsOf(events, rd,
      "user_id", "o_custkey", "ts", "o_ts", Seq("o_orderkey"),
      direction = "forward")
      .select("event_id", "o_orderkey")
    val compFwd = graft.operators.AsOfJoin.leftAsOf(events, rd,
      "user_id", "o_custkey", "ts", "o_ts", Seq("o_orderkey"),
      direction = "forward")
      .select("event_id", "o_orderkey")
    assert(nativeFwd.exceptAll(compFwd).count() === 0)
    assert(compFwd.exceptAll(nativeFwd).count() === 0)
  }
}
