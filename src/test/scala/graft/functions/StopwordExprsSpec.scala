package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The imperative stopword scorers must match the declarative forms
  * they replaced, element for element. */
class StopwordExprsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    "The cat and the dog sat in the garden for a while",
    "el perro y el gato en la casa por la noche",
    "Der Hund und die Katze sind in dem Haus mit den Kindern",
    "xyzzy plugh qwerty",                      // no stopwords → und
    "the el le der",                           // one hit per language: tie
    "").toDF("text")

  test("tokenSetCount ≡ size(filter(toks, isin(...)))") {
    val all = TextFunctions.stopwords.values.flatten.toSeq.distinct
    val both = docs.select(
      StopwordFunctions.tokenSetCount(
        TextFunctions.tokens(lower(col("text"))), all).as("imp"),
      size(filter(TextFunctions.tokens(lower(col("text"))),
        t => t.isin(all: _*))).cast("long").as("decl"))
    both.collect().foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("bestStopwordLang ≡ greatest-of-structs argmax incl. tie-break") {
    val langs = TextFunctions.stopwords.keys.toSeq.sorted
    val scored = langs.map { l =>
      struct(size(filter(TextFunctions.tokens(lower(col("text"))),
        t => t.isin(TextFunctions.stopwords(l): _*))).cast("long")
        .as("hits"), lit(l).as("lang"))
    }
    val declBest = greatest(scored: _*)
    val both = docs.select(
      TextFunctions.langId(col("text")).as("imp"),
      when(declBest.getField("hits") === 0, lit("und"))
        .otherwise(declBest.getField("lang")).as("decl"))
    both.collect().foreach(r => assert(r.getString(0) === r.getString(1)))
    // the tie doc resolves reverse-alphabetically, and no-hit is "und"
    val byText = docs.select(col("text"),
      TextFunctions.langId(col("text")).as("l")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(byText("the el le der") === "fr") // 1 hit each → max lang name
    assert(byText("xyzzy plugh qwerty") === "und")
    assert(byText("") === "und")
  }

  test("meanTokenLen strip-form ≡ per-token aggregate fold") {
    val both = docs.select(
      TextFunctions.meanTokenLen(col("text")).as("imp"),
      {
        val toks = TextFunctions.tokens(col("text"))
        when(size(toks) === 0, lit(0.0)).otherwise(
          aggregate(toks, lit(0L), (acc, t) => acc + length(t))
            .cast("double") / size(toks).cast("double"))
      }.as("decl"))
    both.collect().foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
  }
}
