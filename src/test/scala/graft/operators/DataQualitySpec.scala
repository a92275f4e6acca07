package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DataQualitySpec extends SparkSpec {
  import DataQuality._

  private def resultMap(df: org.apache.spark.sql.DataFrame)
      : Map[String, (Long, Boolean)] =
    df.collect().map(r => r.getAs[String]("constraint_name") ->
      ((r.getAs[Long]("n_violations"), r.getAs[Boolean]("passed")))).toMap

  test("planted violations are counted exactly, per constraint") {
    import spark.implicits._
    val child = Seq(
      (1L, 1, Some(10.0), "A"),  // clean
      (1L, 1, Some(10.0), "A"),  // duplicate key
      (2L, 2, None, "N"),        // null amount (completeness)
      (3L, 3, Some(99.0), "R"),  // out of range
      (4L, 4, Some(-5.0), "X"),  // negative AND bad enum
      (9L, 5, Some(1.0), "A"))   // orphan fk (9 not in parent)
      .toDF("k", "ln", "amount", "flag")
    val parent = Seq(1L, 2L, 3L, 4L).toDF("pk")
    val got = resultMap(validate(child,
      rows = Seq(
        notNull("amount_not_null", col("amount")),
        inRange("amount_1_50", col("amount"), 1.0, 50.0),
        inSet("flag_enum", col("flag"), Seq("A", "N", "R")),
        nonNegative("amount_nonneg", col("amount"))),
      uniqueKey = Some(("pk_unique", col("k") * 10L + col("ln"))),
      fk = Some(("fk_parent", col("k"), parent))))
    assert(got === Map(
      "amount_not_null" -> ((1L, false)),
      "amount_1_50" -> ((2L, false)),  // 99.0 and -5.0 (nulls pass)
      "flag_enum" -> ((1L, false)),
      "amount_nonneg" -> ((1L, false)),
      "pk_unique" -> ((1L, false)),
      "fk_parent" -> ((1L, false))))
  }

  test("clean table passes every constraint with zero violations") {
    import spark.implicits._
    val child = Seq((1L, 1, Some(10.0), "A"), (2L, 1, Some(20.0), "N"))
      .toDF("k", "ln", "amount", "flag")
    val parent = Seq(1L, 2L).toDF("pk")
    val got = resultMap(validate(child,
      rows = Seq(notNull("amount_not_null", col("amount")),
        matches("flag_pattern", col("flag"), "^[ANR]$")),
      uniqueKey = Some(("pk_unique", col("k") * 10L + col("ln"))),
      fk = Some(("fk_parent", col("k"), parent))))
    assert(got.values.forall { case (v, p) => v == 0L && p })
    assert(got.keySet === Set("amount_not_null", "flag_pattern",
      "pk_unique", "fk_parent"))
  }

  test("single full-table pass: one aggregate covers all row checks") {
    import spark.implicits._
    val child = Seq((1L, 1, Some(10.0), "A")).toDF("k", "ln", "amount",
      "flag")
    val df = validate(child,
      rows = Seq(notNull("c1", col("amount")),
        inRange("c2", col("amount"), 0, 99),
        inSet("c3", col("flag"), Seq("A"))),
      uniqueKey = Some(("c4", col("k"))))
    df.queryExecution.toRdd.foreach(_ => ())
    // AQE's toString prints the final AND the initial plan — audit the
    // final section only
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // the row battery plus uniqueness folds into one scan of the
    // child: exactly one parquet/LocalTableScan leaf, no per-
    // constraint re-reads
    val leaves = plan.linesIterator
      .count(l => l.contains("LocalTableScan"))
    assert(leaves == 1, s"expected one scan leaf, plan:\n$plan")
    assert(plan.contains("HashAggregate"), "battery is one aggregate")
  }
}
