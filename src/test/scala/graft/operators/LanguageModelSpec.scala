package graft.operators

import graft.{SparkSpec, Tables}
import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.functions._

/** Bigram LM: hand-computed smoothed log-likelihoods on a tiny corpus,
  * and the discriminative property the signal exists for (in-language
  * text outscores off-language text under an in-language model). */
class LanguageModelSpec extends SparkSpec {

  test("docBigrams emits every occurrence, none for short docs") {
    import spark.implicits._
    val d = Seq((1L, "a b a"), (2L, "solo"), (3L, "")).toDF("id", "text")
    val bg = LanguageModel.docBigrams(d, "id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(bg.toSeq.sorted === Seq((1L, "a", "b"), (1L, "b", "a")))
  }

  test("bigramLogLik matches hand-computed Laplace probabilities") {
    import spark.implicits._
    // train: bigrams (a,b)x2 (b,a)x2 (a,c)x1 → c1: a=3 b=2; vocab=3
    val train = Seq((100L, "a b a b a c")).toDF("id", "text")
    val score = Seq((1L, "a b"), (2L, "z z"), (3L, "a")).toDF("id", "text")
    val out = LanguageModel.bigramLogLik(score, train, "id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2))).toMap
    // P(b|a) = (2+1)/(3+3); P(z|z) = (0+1)/(0+3)
    assert(out(1L) === ((1L, math.rint(math.log(3.0 / 6.0) * 1e4) / 1e4)))
    assert(out(2L) === ((1L, math.rint(math.log(1.0 / 3.0) * 1e4) / 1e4)))
    assert(!out.contains(3L)) // no bigrams → no row
  }

  test("importanceWeights equals two independent bigramLogLik runs") {
    val dd = Tables.documents(spark, sf())
      .withColumn("norm_text", TF.normalize(col("text")))
    val target = dd.filter(col("lang") === "en")
    val fused = LanguageModel.importanceWeights(
      dd, target, dd, "doc_id", "norm_text")
    val t = LanguageModel.bigramLogLik(dd, target, "doc_id", "norm_text")
      .withColumnRenamed("avg_ll", "t_ll")
    val r = LanguageModel.bigramLogLik(dd, dd, "doc_id", "norm_text")
      .withColumnRenamed("avg_ll", "r_ll").drop("n_bigrams")
    val joined = fused.join(t, "doc_id").join(r, "doc_id")
    assert(joined.count() === fused.count())
    assert(joined.filter(
      col("avg_ll_target") =!= col("t_ll") ||
        col("avg_ll_raw") =!= col("r_ll") ||
        col("logw") =!= round(col("t_ll") - col("r_ll"), 4))
      .count() === 0L)
  }

  test("importanceWeightsSelf equals the general two-frame form") {
    val dd = Tables.documents(spark, sf())
      .withColumn("norm_text", TF.normalize(col("text")))
    val general = LanguageModel.importanceWeights(
      dd, dd.filter(col("lang") === "en"), dd, "doc_id", "norm_text")
    val fused = LanguageModel.importanceWeightsSelf(
      dd, col("lang") === "en", "doc_id", "norm_text")
    assert(fused.columns.toSeq === general.columns.toSeq)
    assert(fused.count() === general.count())
    val g = general.withColumnRenamed("n_bigrams", "g_n")
      .withColumnRenamed("avg_ll_target", "g_t")
      .withColumnRenamed("avg_ll_raw", "g_r")
      .withColumnRenamed("logw", "g_w")
    assert(fused.join(g, "doc_id").filter(
      col("n_bigrams") =!= col("g_n") ||
        col("avg_ll_target") =!= col("g_t") ||
        col("avg_ll_raw") =!= col("g_r") ||
        col("logw") =!= col("g_w")).count() === 0L)
  }

  test("importance weight favors target-like documents") {
    import spark.implicits._
    // target: "a b" language; raw pool: half "a b", half "x y"
    val target = Seq((100L, "a b a b a b")).toDF("id", "text")
    val raw = Seq((1L, "a b a b"), (2L, "x y x y")).toDF("id", "text")
    val w = LanguageModel.importanceWeights(raw, target, raw, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    // the RANKING is the property DSIR selection relies on (absolute
    // signs are a Laplace artifact at toy vocabulary sizes: a 2-token
    // target vocab gives every unseen bigram P = 1/2)
    assert(w(1L) > w(2L))
  }

  test("en-trained model scores en docs above fr docs on real data") {
    val dd = Tables.documents(spark, sf())
      .withColumn("norm_text", TF.normalize(col("text")))
    val scored = LanguageModel.bigramLogLik(
      dd, dd.filter(col("lang") === "en"), "doc_id", "norm_text")
      .join(dd.select("doc_id", "lang"), "doc_id")
      .groupBy("lang").agg(avg("avg_ll").as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(scored("en") > scored("fr"))
    assert(scored("en") > scored("de"))
  }
}
