package graft.operators

import graft.SparkSpec

/** Cross-document repeated token spans (substring-level exact dedup). */
class SpanDedupSpec extends SparkSpec {

  test("a planted shared paragraph surfaces; unique text does not") {
    import spark.implicits._
    val footer = "this footer repeats on every page of the site verbatim"
    val docs = Seq(
      (1L, s"unique alpha content one two three $footer"),
      (2L, s"other beta words entirely different $footer"),
      (3L, "completely unrelated text with no repeated span at all here"))
      .toDF("id", "text")
    val spans = Dedup.repeatedSpans(docs, "id", "text", n = 8, minDocs = 2L)
      .collect()
    // every surfaced span is the footer (or a window overlapping it)
    assert(spans.nonEmpty)
    assert(spans.forall(_.getAs[Long]("n_docs") === 2L))
    assert(spans.exists(_.getAs[String]("span") ===
      "this footer repeats on every page of the"))
    spans.foreach { r =>
      assert(r.getAs[String]("span").split(" ").length === 8)
      assert(r.getAs[Long]("first_doc") === 1L || r.getAs[Long]("first_doc") === 2L)
      assert(r.getAs[Long]("n_occ") >= r.getAs[Long]("n_docs"))
    }
    // the full 10-token footer yields 3 distinct 8-token windows, but only
    // those fully inside the shared suffix appear in BOTH docs: the footer
    // is 10 tokens; windows entirely within it = 3
    assert(spans.length === 3)
  }

  test("within-doc repetition alone does not cross the minDocs cut") {
    import spark.implicits._
    val rep = "one two three four five six seven eight"
    val docs = Seq((1L, s"$rep and again $rep")).toDF("id", "text")
    val spans = Dedup.repeatedSpans(docs, "id", "text", n = 8, minDocs = 2L)
    assert(spans.count() === 0L)
    // but the occurrence count sees both copies at minDocs = 1
    val one = Dedup.repeatedSpans(docs, "id", "text", n = 8, minDocs = 1L)
      .filter(org.apache.spark.sql.functions.col("span") ===
        rep).collect()
    assert(one.length === 1 && one.head.getAs[Long]("n_occ") === 2L)
  }
}
