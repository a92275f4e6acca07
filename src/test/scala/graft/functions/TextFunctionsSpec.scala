package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpec {
  import TextFunctions._

  private def one(text: String, c: org.apache.spark.sql.Column): Any = {
    import spark.implicits._
    Seq(text).toDF("t").select(c.as("r")).head().get(0)
  }

  test("tokens and tokenCount") {
    assert(one("  a b   c ", tokenCount(col("t"))) === 3L)
    assert(one("", tokenCount(col("t"))) === 0L)
    assert(one("   ", tokenCount(col("t"))) === 0L)
    assert(one("one", tokenCount(col("t"))) === 1L)
  }

  test("regexTokenCount splits words, numbers, punctuation") {
    // "it's 42." → it, ', s, 42, . = 5
    assert(one("it's 42.", regexTokenCount(col("t"))) === 5L)
  }

  test("ratios bounded and exact on crafted input") {
    assert(one("ab..", punctRatio(col("t"))) === 0.5)
    assert(one("a b", whitespaceRatio(col("t"))).asInstanceOf[Double]
      === 1.0 / 3.0)
    assert(one("", punctRatio(col("t"))) === 0.0)
  }

  test("meanTokenLen") {
    assert(one("ab cdef", meanTokenLen(col("t"))) === 3.0)
    assert(one("", meanTokenLen(col("t"))) === 0.0)
  }

  test("langId picks the stopword-dominant language, und when none") {
    assert(one("the cat and the dog of it", langId(col("t"))) === "en")
    assert(one("el perro y la casa de que", langId(col("t"))) === "es")
    assert(one("der hund und die katze von", langId(col("t"))) === "de")
    assert(one("xyzzy qwerty", langId(col("t"))) === "und")
  }

  test("normalize strips punct, lowers, collapses whitespace") {
    assert(one("  Hello,   WORLD!! 42 ", normalize(col("t")))
      === "hello world 42")
  }

  test("fingerprint equals md5 of normalized text") {
    val fp = one("Hello, World!", fingerprint(col("t"))).asInstanceOf[String]
    val expect = java.security.MessageDigest.getInstance("MD5")
      .digest("hello world".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(fp === expect)
  }

  test("rollingHash matches a reference fold") {
    val got = one("ab c", rollingHash(col("t"))).asInstanceOf[Long]
    val expect = "ab c".toSeq.foldLeft(0L)((a, ch) =>
      (a * 31 + ch.toInt) % 1000000007L)
    assert(got === expect)
  }

  test("wordShingles windows and degenerate cases") {
    import spark.implicits._
    val sh = Seq("a b c d").toDF("t")
      .select(wordShingles(col("t"), 3).as("s"))
      .head().getSeq[String](0)
    assert(sh === Seq("a b c", "b c d"))
    val short = Seq("a b").toDF("t")
      .select(wordShingles(col("t"), 3).as("s")).head().getSeq[String](0)
    assert(short === Seq("a b"))
  }

  test("charNgrams") {
    import spark.implicits._
    val ng = Seq("abcd").toDF("t")
      .select(charNgrams(col("t"), 3).as("s")).head().getSeq[String](0)
    assert(ng === Seq("abc", "bcd"))
  }
}
