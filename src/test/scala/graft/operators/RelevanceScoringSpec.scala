package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BM25/TF-IDF sanity on a hand corpus with known frequencies. */
class RelevanceScoringSpec extends SparkSpec {

  import spark.implicits._

  private lazy val corpus = Seq(
    (1L, "spark shuffle join join join"),
    (2L, "spark shuffle"),
    (3L, "spark join once in a much longer document about other things"),
    (4L, "nothing relevant here at all")
  ).toDF("doc_id", "text")

  test("bm25 ranks repeated-term docs above single-hit docs, omits misses") {
    val scores = RelevanceScoring.bm25(corpus, "doc_id", "text",
      Seq("join"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores.keySet === Set(1L, 3L)) // doc 2/4 have no query term
    assert(scores(1L) > scores(3L)) // tf=3 short doc beats tf=1 long doc
    assert(scores.values.forall(_ > 0))
  }

  test("bm25 multi-term query sums per-term contributions") {
    val one = RelevanceScoring.bm25(corpus, "doc_id", "text", Seq("spark"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val both = RelevanceScoring.bm25(corpus, "doc_id", "text",
      Seq("spark", "join"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // doc 2 matches only 'spark': its score must be identical either way
    assert(math.abs(both(2L) - one(2L)) < 1e-9)
    assert(both(1L) > one(1L)) // doc 1 gains the 'join' contribution
  }

  test("tfidf: rarer terms score higher at equal tf") {
    // in doc 2 both terms have tf=1; df(shuffle)=2 < df(spark)=3
    val t = RelevanceScoring.tfidf(corpus, "doc_id", "text")
      .filter(col("doc_id") === 2L)
      .collect().map(r => r.getString(1) -> r.getDouble(2)).toMap
    assert(t("shuffle") > t("spark"))
  }
}
