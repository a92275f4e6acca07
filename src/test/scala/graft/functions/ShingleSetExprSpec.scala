package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DistinctShingles must be semantically identical to the declarative
  * form it replaces: array_distinct over the sliding concat_ws windows,
  * with the short-input special cases. */
class ShingleSetExprSpec extends SparkSpec {
  import spark.implicits._

  private val n = 3

  test("equals array_distinct(shinglesFromTokens) on arbitrary docs") {
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a b a b a b a b",                      // repeats → distinct matters
      "one two",                              // fewer than n tokens
      "single",
      "x y z x y z x y z"                     // whole doc repeats
    ).toDF("text")
      .select(TextFunctions.tokens(col("text")).as("toks"))
    val both = docs.select(
      ShingleFunctions.distinctShingles(col("toks"), n).as("imp"),
      array_distinct(
        TextFunctions.shinglesFromTokens(col("toks"), n)).as("decl"))
    both.collect().foreach { r =>
      assert(r.getSeq[String](0) === r.getSeq[String](1))
    }
  }

  test("special cases: empty array and sub-n docs") {
    val out = Seq(
      (1L, Array.empty[String]),
      (2L, Array("only", "two")))
      .toDF("id", "toks")
      .select(col("id"),
        ShingleFunctions.distinctShingles(col("toks"), n).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(1L) === Seq.empty)
    assert(out(2L) === Seq("only two"))
  }

  test("first-occurrence order is preserved (array_distinct contract)") {
    val sh = Seq(Array("b", "c", "b", "c", "b", "c", "a"))
      .toDF("toks")
      .select(ShingleFunctions.distinctShingles(col("toks"), 2).as("sh"))
      .head().getSeq[String](0)
    assert(sh === Seq("b c", "c b", "c a"))
  }

  test("rejects non-positive n and wrong input type") {
    val e = intercept[Exception] {
      Seq(Array("a")).toDF("toks")
        .select(ShingleFunctions.distinctShingles(col("toks"), 0))
        .collect()
    }
    assert(e.getMessage.toLowerCase.contains("n must be >= 1") ||
      e.getMessage.toLowerCase.contains("datatype_mismatch"))
  }
}
