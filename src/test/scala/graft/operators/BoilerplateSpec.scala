package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Boilerplate removal: segmentation boundaries, dictionary threshold,
  * planted-boilerplate cleaning, and full-token accounting. */
class BoilerplateSpec extends SparkSpec {

  import spark.implicits._

  // "FOOTER TEXT HERE" planted in 4 of 5 docs as a whole segment
  private val docs = Seq(
    (1L, "alpha beta gamma footer text here"),
    (2L, "delta epsilon zeta footer text here"),
    (3L, "eta theta iota footer text here"),
    (4L, "kappa lambda mu footer text here"),
    (5L, "nu xi omicron pi rho"),
  ).toDF("doc_id", "text")
    .withColumn("toks", split(col("text"), " "))

  test("segments: non-overlapping width-3 chunks, short tail kept") {
    val segs = Boilerplate.segments(docs, "doc_id", "toks", width = 3)
      .collect()
    // doc 5 has 5 tokens -> segments of 3 and 2
    val d5 = segs.filter(_.getLong(0) == 5L).sortBy(_.getLong(1))
    assert(d5.map(_.getLong(3)).toSeq === Seq(3L, 2L))
    // every doc's segment lengths sum to its token count
    segs.groupBy(_.getLong(0)).foreach { case (id, rows) =>
      val total = docs.filter(col("doc_id") === id)
        .select(size(col("toks"))).head().getInt(0)
      assert(rows.map(_.getLong(3)).sum === total.toLong)
    }
  }

  test("commonSegments: threshold counts DISTINCT docs") {
    val segs = Boilerplate.segments(docs, "doc_id", "toks", 3)
    assert(Boilerplate.commonSegments(segs, "doc_id", minDocs = 3)
      .count() === 1L) // the footer appears in 4 docs
    assert(Boilerplate.commonSegments(segs, "doc_id", minDocs = 4)
      .count() === 0L)
  }

  test("cleanStats: planted footer dropped, unique text kept whole") {
    val stats = Boilerplate.cleanStats(docs, "doc_id", "toks",
        width = 3, minDocs = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // docs 1-4: 2 segments, 1 dropped (the footer), 3 tokens kept
    (1L to 4L).foreach { id =>
      assert(stats(id) === ((2L, 1L, 3L)), s"doc $id")
    }
    // doc 5: nothing dropped, all 5 tokens kept
    assert(stats(5L) === ((2L, 0L, 5L)))
  }
}
