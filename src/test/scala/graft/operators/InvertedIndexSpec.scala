package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Inverted-index build: df counts distinct documents (not
  * occurrences), posting heads are the k smallest doc ids, minDf cuts
  * the tail. */
class InvertedIndexSpec extends SparkSpec {

  import spark.implicits._

  test("df is per-document; postings are the k smallest ids") {
    val df = Seq(
      (3L, "alpha beta alpha alpha"), // 'alpha' 3x in one doc -> df 1
      (1L, "alpha gamma"),
      (2L, "alpha beta"),
      (4L, "")).toDF("doc_id", "text")
    val got = InvertedIndex.postings(df, "doc_id", "text",
      minDf = 1L, sampleK = 2)
      .collect().map(r =>
        r.getString(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(got("alpha") === ((3L, "1,2"))) // capped at k=2, ascending
    assert(got("beta") === ((2L, "2,3")))
    assert(got("gamma") === ((1L, "1")))
  }

  test("minDf cuts singletons; empty docs contribute nothing") {
    val df = Seq(
      (1L, "x y"), (2L, "x"), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = InvertedIndex.postings(df, "doc_id", "text",
      minDf = 2L, sampleK = 5)
      .collect().map(r => r.getString(0)).toSet
    assert(got === Set("x"))
  }

  test("plans one shuffle: partial topk aggregate before the exchange") {
    val d = graft.Tables.documents(spark, sf())
    val plan = InvertedIndex.postings(d, "doc_id", "text", 2L, 5)
      .queryExecution.executedPlan.toString
    // ObjectHashAggregate partial -> single Exchange -> final
    assert(plan.contains("ObjectHashAggregate"))
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 1)
  }
}
