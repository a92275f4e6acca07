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

  test("sparse cosine pairs: hand arithmetic, df cap, threshold") {
    // 4 docs; 'common' is in all 4 (absolute df cap 3 drops it);
    // docs 1/2 share {alpha beta}, doc 3 shares nothing surviving
    val docs4 = Seq(
      (1L, "alpha beta common"), (2L, "alpha beta common"),
      (3L, "gamma delta common"), (4L, "epsilon common zeta"))
      .toDF("doc_id", "text")
    val got = RelevanceScoring.sparseCosinePairs(
      docs4, "doc_id", "text", maxDf = 3L, minCos = 0.0)
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        (r.getAs[Long]("n_shared"), r.getAs[Double]("cos"))).toMap
    // only (1,2) share surviving terms — identical pruned vectors
    assert(got.keySet === Set((1L, 2L)))
    assert(got((1L, 2L))._1 === 2L)
    assert(got((1L, 2L))._2 === 1.0)
    // with the cap lifted, 'common' links every pair
    val all = RelevanceScoring.sparseCosinePairs(
      docs4, "doc_id", "text", maxDf = 4L, minCos = 0.0)
    assert(all.count() === 6L)
    // hand check one non-trivial cosine at cap 4: docs 1 and 3
    // share only 'common'; wt(common) = (1+ln 1)·ln(5/5) = 0 → cos 0
    val c13 = all.filter(col("doc_a") === 1L && col("doc_b") === 3L)
      .collect().head.getAs[Double]("cos")
    assert(c13 === 0.0)
    // threshold actually cuts
    assert(RelevanceScoring.sparseCosinePairs(
      docs4, "doc_id", "text", maxDf = 4L, minCos = 0.5)
      .count() < 6L)
  }

  test("sparse cosine at df cap 350 isolates the planted duplicates") {
    val real = graft.Tables.documents(spark, sf())
      .withColumn("norm_text",
        graft.functions.TextFunctions.normalize(col("text")))
    val pairs = RelevanceScoring.sparseCosinePairs(
      real, "doc_id", "norm_text", maxDf = 350L, minCos = 0.0)
      .collect()
    // only rare (planted-duplicate) terms survive the cap: every
    // surviving pair is an exact lexical duplicate, cos = 1.0
    assert(pairs.nonEmpty)
    assert(pairs.forall(_.getAs[Double]("cos") === 1.0))
  }
}
