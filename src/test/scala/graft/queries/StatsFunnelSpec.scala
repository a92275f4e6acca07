package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CUBE grouping sets, SCD-2 intervals, exact correlation moments,
  * the event funnel, and the rank-statistic AUC. */
class StatsFunnelSpec extends SparkSpec {

  test("q27_cube: slices are consistent and the grand total is exact") {
    val rows = RelationalQueries.q27Cube(spark, sf()).collect()
    val total = Tables.lineitem(spark, sf()).count()
    // grand-total row (both keys null) carries the full row count
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length === 1)
    assert(grand.head.getAs[Long]("cnt") === total)
    // each one-key slice sums to the grand total
    val byFlag = rows.filter(r => !r.isNullAt(0) && r.isNullAt(1))
    assert(byFlag.map(_.getAs[Long]("cnt")).sum === total)
    val byStatus = rows.filter(r => r.isNullAt(0) && !r.isNullAt(1))
    assert(byStatus.map(_.getAs[Long]("cnt")).sum === total)
  }

  test("scd2_intervals: runs chain, alternate, and account for all orders") {
    val iv = RelationalQueries.q28Scd2(spark, sf()).collect()
      .groupBy(_.getAs[Long]("custkey"))
    val sentinel = java.sql.Date.valueOf("9999-12-31")
    iv.foreach { case (_, rs) =>
      val runs = rs.sortBy(_.getAs[Long]("run_id"))
      // run ids are 1..k; consecutive runs change priority; intervals chain
      assert(runs.map(_.getAs[Long]("run_id")).toSeq ===
        (1L to runs.length.toLong))
      runs.zip(runs.drop(1)).foreach { case (a, b) =>
        assert(a.getAs[String]("prio") !== b.getAs[String]("prio"))
        assert(a.getAs[java.sql.Date]("valid_to") ===
          b.getAs[java.sql.Date]("valid_from"))
      }
      assert(runs.last.getAs[java.sql.Date]("valid_to") === sentinel)
    }
    val nOrders = Tables.orders(spark, sf()).count()
    assert(iv.values.flatten.map(_.getAs[Long]("n_orders")).sum === nOrders)
  }

  test("stat_corr: moments match a direct computation, corr bounded") {
    val rows = RelationalQueries.q29CorrStats(spark, sf()).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val c = r.getAs[Double]("corr")
      assert(c >= -1.0 && c <= 1.0)
    }
    // cross-check one group's mean against the built-in avg
    val direct = Tables.lineitem(spark, sf())
      .groupBy("l_returnflag").agg(avg("l_quantity").as("m")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      val got = r.getAs[Double]("mean_qty")
      assert(math.abs(got - direct(r.getString(0))) < 1e-6)
    }
  }

  test("funnel_steps: counts are monotone and step 1 is exact") {
    val steps = EventQueries.funnelSteps(spark, sf()).collect()
      .map(r => r.getAs[String]("step") -> r.getAs[Long]("n_users")).toMap
    assert(steps.keySet === Set("1_view", "2_click", "3_purchase"))
    assert(steps("1_view") >= steps("2_click"))
    assert(steps("2_click") >= steps("3_purchase"))
    val viewers = Tables.events(spark, sf())
      .filter(col("event_type") === "view")
      .select("user_id").distinct().count()
    assert(steps("1_view") === viewers)
    assert(steps("3_purchase") > 0L) // the funnel isn't vacuous at sf0.001
  }

  test("model_auc equals the per-row Mann-Whitney rank computation") {
    val lane = PipelineQueries.modelAuc(spark, sf()).collect().head
    // independent per-ROW derivation: tie-averaged ranks via avg(rn)
    // over each score's rows (small data — single window is fine here)
    val docs = Tables.documents(spark, sf())
    val scored = graft.operators.ModelScoring
      .linearQualityScore(docs, "doc_id", "text")
      .join(docs.select(col("doc_id"),
        (col("lang") === "en").cast("long").as("pos")), "doc_id")
      .withColumn("rn", row_number().over(
        Window.orderBy(col("logit_micro"), col("doc_id"))))
      .withColumn("avg_rank",
        avg(col("rn")).over(Window.partitionBy(col("logit_micro"))))
    val r = scored.agg(
      sum(when(col("pos") === 1L, col("avg_rank"))).as("rank_sum"),
      sum(col("pos")).as("p"), count(lit(1)).as("t")).collect().head
    val (rankSum, p, t) =
      (r.getAs[Double]("rank_sum"), r.getAs[Long]("p"), r.getAs[Long]("t"))
    val expected = (rankSum - p.toDouble * (p + 1) / 2.0) /
      (p.toDouble * (t - p).toDouble)
    assert(lane.getAs[Long]("n_pos") === p)
    assert(lane.getAs[Long]("n_neg") === t - p)
    assert(math.abs(lane.getAs[Double]("auc") - expected) < 1e-6)
    // the placeholder model must actually rank en above the rest
    assert(lane.getAs[Double]("auc") > 0.5)
  }
}
