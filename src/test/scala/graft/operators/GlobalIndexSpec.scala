package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class GlobalIndexSpec extends SparkSpec {

  test("global index equals the total-order rank, contiguous from 0") {
    import spark.implicits._
    val keys = new scala.util.Random(7).shuffle((0 until 1000).toList)
    val df = keys.map(k => (k.toLong * 13 + 5, s"row_$k"))
      .toDF("k", "payload").repartition(6)
    val (out, release) =
      GlobalIndex.withGlobalIndexPinned(df, "k", nRanges = 7)
    val got = out.select("k", "global_idx").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = keys.map(_.toLong * 13 + 5).sorted.zipWithIndex
      .map { case (k, i) => k -> i.toLong }.toMap
    assert(got === want)
    assert(got.values.toSeq.sorted === (0L until 1000L))
    release()
  }

  test("large nRanges takes the broadcast-offsets branch and stays exact") {
    import spark.implicits._
    val df = (0 until 300).map(_.toLong).toDF("k")
    val (out, release) =
      GlobalIndex.withGlobalIndexPinned(df, "k", nRanges = 100)
    val got = out.orderBy("k").select("global_idx")
      .collect().map(_.getLong(0)).toSeq
    assert(got === (0L until 300L))
    release()
  }

  test("no single-partition exchange in the plan (the naive window has one)") {
    import spark.implicits._
    val df = (0 until 500).map(_.toLong).toDF("k")
    val (out, release) =
      GlobalIndex.withGlobalIndexPinned(df, "k", nRanges = 5)
    out.count() // materialize
    assert(!out.queryExecution.executedPlan.toString
      .contains("SinglePartition"))
    release()
    val naive = df.withColumn("global_idx",
      row_number().over(Window.orderBy("k")).cast("long") - 1)
    naive.count()
    assert(naive.queryExecution.executedPlan.toString
      .contains("SinglePartition"))
  }

  test("release handle drops the pinned blocks") {
    import spark.implicits._
    val before = spark.sparkContext.getPersistentRDDs.size
    val (out, release) = GlobalIndex.withGlobalIndexPinned(
      (0 until 100).map(_.toLong).toDF("k"), "k", nRanges = 3)
    out.count()
    assert(spark.sparkContext.getPersistentRDDs.size > before)
    release()
    val live = spark.sparkContext.getPersistentRDDs.values
      .count(_.getStorageLevel.useMemory)
    assert(live <= before)
  }

  test("multi-column mixed-direction order (cnt DESC, token ASC) — the " +
      "vocabulary-id shape — matches the naive window rank exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val df = (0 until 400).map(i => (s"tok_$i", (rnd.nextInt(20) + 1).toLong))
      .toDF("token", "cnt").repartition(5)
    val (out, release) = GlobalIndex.withGlobalIndexPinned(df,
      Seq(col("cnt").desc, col("token").asc), nRanges = 6, out = "id")
    val got = out.select("token", "id").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = df.collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (t, c) => (-c, t) }.zipWithIndex
      .map { case ((t, _), i) => t -> i.toLong }.toMap
    assert(got === want)
    release()
  }
}
