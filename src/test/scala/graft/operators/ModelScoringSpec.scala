package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Linear-model inference: hand-checked feature counts and logit
  * arithmetic, map-only plan, and a discriminative label split on the
  * real corpus. */
class ModelScoringSpec extends SparkSpec {

  import spark.implicits._

  test("feature counts and integer logit match hand arithmetic") {
    val docs = Seq(
      (1L, "two words"),                  // tok 2, dig 0, punct 0, ch 9
      (2L, "a 42! x."),                   // tok 3, dig 2, punct 2, ch 8
      (3L, "")).toDF("doc_id", "text")    // all zero
    val out = ModelScoring.linearQualityScore(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_digits"),
          r.getAs[Long]("n_punct"), r.getAs[Long]("n_chars"),
          r.getAs[Long]("logit_micro"), r.getAs[Boolean]("keep"))).toMap
    assert(out(1L) === ((2L, 0L, 0L, 9L,
      250000L + 12000L * 2 - 3000L * 9, true)))
    assert(out(2L) === ((3L, 2L, 2L, 8L,
      250000L + 12000L * 3 - 3000L * 2 + 8000L * 2 - 3000L * 8, true)))
    assert(out(3L) === ((0L, 0L, 0L, 0L, 250000L, true)))
  }

  test("scoring is map-only: no exchange in the plan") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val plan = ModelScoring.linearQualityScore(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("placeholder weights split the real corpus, not rubber-stamp it") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val byKeep = ModelScoring.linearQualityScore(docs, "doc_id", "text")
      .groupBy("keep").count().collect()
      .map(r => r.getAs[Boolean]("keep") -> r.getAs[Long]("count")).toMap
    assert(byKeep.getOrElse(true, 0L) > 0L)
    assert(byKeep.getOrElse(false, 0L) > 0L)
  }
}
