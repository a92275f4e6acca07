package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, GraftPlanBridge}
import org.apache.spark.sql.functions._

/** Auto-injected Bloom pruning: the rule must fire on the obvious
  * filtered-dim join (visible in the optimized plan), must NOT fire
  * without a selective build-side filter, must be idempotent under the
  * fixed-point batch, and must leave results row-identical. */
class BloomJoinInjectSpec extends SparkSpec {

  import spark.implicits._

  private def withRule[A](f: => A): A = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val before = cs.experimental.extraOptimizations
    GraftPlanBridge.ensureOptimizerRule(spark, BloomJoinInject.InjectRule)
    try f finally cs.experimental.extraOptimizations = before
  }

  // parquet-backed (a LocalRelation build side would have its Filter
  // constant-folded away before the rule sees it — which is correct:
  // there is nothing to prune I/O on)
  private lazy val dir = {
    val d = s"${sys.props("java.io.tmpdir")}/graft_bloominject_spec"
    (1L to 5000L).map(i => (i, i % 50)).toDF("pk", "pv")
      .write.mode("overwrite").parquet(s"$d/probe")
    (1L to 500L).map(i => (i, if (i % 5 == 0) "hot" else "cold"))
      .toDF("bk", "tag").write.mode("overwrite").parquet(s"$d/build")
    d
  }
  private def probe: DataFrame = spark.read.parquet(s"$dir/probe")
  private def build: DataFrame = spark.read.parquet(s"$dir/build")

  test("rule injects might_contain on the filtered-dim join") {
    withRule {
      val df = probe.join(build.filter(col("tag") === "hot"),
        col("pk") === col("bk"))
      val opt = df.queryExecution.optimizedPlan.toString
      assert(opt.contains("might_contain"), s"no injection in:\n$opt")
      // idempotence under the fixed-point batch: exactly one filter
      assert(opt.sliding("might_contain".length).count(_ == "might_contain") === 1)
      val got = df.select("pk", "tag").collect().map(_.getLong(0)).sorted
      assert(got.toSeq === (5L to 500L by 5).toSeq)
    }
  }

  test("an explicit might_contain on one join doesn't block injection " +
      "on other joins (per-join idempotence scope)") {
    withRule {
      // join 1: explicit operator form — carries a literal-blob
      // might_contain on pk before the rule ever runs
      val explicit = graft.operators.RuntimeFilters.bloomPrunedJoin(
        probe, build.filter(col("tag") === "hot"), "pk", "bk")
      // join 2: the obvious filtered-dim join on a DIFFERENT key — the
      // rule must still inject here instead of bailing on the whole plan
      val dim2 = build.select(col("bk").as("bk2"),
        col("tag").as("tag2"))
      val df = explicit.join(dim2.filter(col("tag2") === "hot"),
        col("pv") === col("bk2") % 50)
      val opt = df.queryExecution.optimizedPlan.toString
      val n = opt.sliding("might_contain".length)
        .count(_ == "might_contain")
      assert(n >= 2, s"expected the explicit filter PLUS an injected " +
        s"one, found $n in:\n$opt")
    }
  }

  test("declines when the build side is a large un-analyzed scan") {
    withRule {
      // roles flipped: the filtered side is the 10×-larger probe table.
      // Without ANALYZE/CBO stats, Filter passes through its child's
      // file-size estimate, so the build side is NOT smaller than the
      // probe and the relative-size guard must decline.
      val df = build.join(probe.filter(col("pv") === 7),
        col("bk") === col("pk"))
      val opt = df.queryExecution.optimizedPlan.toString
      assert(!opt.contains("might_contain"),
        s"rule should decline on a larger-than-probe build side:\n$opt")
      // pk ≡ 7 (mod 50) up to 5000 → 100 rows, of which pk ≤ 500 match
      assert(df.count() === 10L)
    }
  }

  test("no injection without a selective build filter") {
    withRule {
      val df = probe.join(build, col("pk") === col("bk"))
      assert(!df.queryExecution.optimizedPlan.toString
        .contains("might_contain"))
      assert(df.count() === 500L)
    }
  }

  test("lane q43 equals the unruled join, and its plan carries the prune") {
    val d = sf()
    val want = graft.queries.RelationalQueries.q42BloomJoin(spark, d)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSet
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val before = cs.experimental.extraOptimizations
    try {
      val df = graft.queries.RelationalQueries.q43BloomRewrite(spark, d)
      assert(df.queryExecution.optimizedPlan.toString
        .contains("might_contain"))
      val got = df.collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got === want)
    } finally cs.experimental.extraOptimizations = before
  }
}
