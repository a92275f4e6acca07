package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Physical-plan audit (the ".explain and iterate" discipline from the
  * build brief): for each audited query, assert the plan properties that
  * matter at 100 TB — dimension joins broadcast (no sort-merge on a
  * dim), column pruning reaching the parquet scan, aggregates
  * partial+final, whole-stage codegen present. Run:
  *   sbt "runMain graft.PlanAudit /root/testdata/sf0.001"
  * Prints one PASS/FAIL line per assertion; exits nonzero on FAIL.
  */
object PlanAudit {

  private var failures = 0

  private def check(name: String, cond: Boolean, detail: String): Unit = {
    val status = if (cond) "PASS" else { failures += 1; "FAIL" }
    println(f"[$status] $name%-50s $detail")
  }

  private def occurrences(haystack: String, needle: String): Int = {
    var n = 0; var i = haystack.indexOf(needle)
    while (i >= 0) { n += 1; i = haystack.indexOf(needle, i + 1) }
    n
  }

  private def executedPlan(p: SparkPlan): String = p match {
    case a: AdaptiveSparkPlanExec => a.executedPlan.toString
    case other => other.toString
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-plan-audit")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def plan(q: String): String = {
      val df = SparkEntry.queries(q)(spark, sfDir)
      df.queryExecution.toRdd.foreach(_ => ()) // finalize AQE plan
      executedPlan(df.queryExecution.executedPlan)
    }

    val q1 = plan("q1_count_by_flag")
    check("q1: partial+final hash aggregate",
      occurrences(q1, "HashAggregate") >= 2, "two HashAggregate levels")
    // codegen'd operators carry a "*(stageId)" prefix in plan strings
    check("q1: whole-stage codegen", q1.contains("*("), "")
    check("q1: scan prunes to 1 column",
      q1.contains("ReadSchema: struct<l_returnflag:string>"),
      "only l_returnflag read")

    val q7 = plan("q7_denorm_join")
    check("q7: all dim joins broadcast",
      occurrences(q7, "BroadcastHashJoin") >= 5 &&
        !q7.contains("SortMergeJoin"),
      "5 BroadcastHashJoins, no SortMergeJoin")

    val q9 = plan("q9_projection")
    check("q9: no shuffle in pure projection", !q9.contains("Exchange"),
      "map-only stage")

    val q10 = plan("q10_isin_predicate")
    check("q10: filter pushed to parquet scan", q10.contains("PushedFilters: [In(l_returnflag"),
      "In-filter reaches the scan")

    val ann = plan("ann_bruteforce")
    check("ann: probe side broadcast", ann.contains("BroadcastNestedLoopJoin")
      || ann.contains("BroadcastHashJoin"), "corpus never shuffled for probes")
    check("ann: native cosine in codegen",
      !ann.contains("CodegenFallback") || ann.contains("cosinesimilarityexpr"),
      "no interpreted fallback in scoring")

    val dm = plan("dedup_minhash")
    check("minhash: map-side partial mins",
      occurrences(dm, "HashAggregate") >= 2, "partial+final signature agg")

    val se = plan("sessionize")
    check("sessionize: single shuffle on user_id",
      occurrences(se, "Exchange hashpartitioning(user_id") >= 1,
      "window + agg share the user_id partitioning")

    println(s"\n$failures failures")
    spark.stop()
    if (failures > 0) sys.exit(1)
  }
}
