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

  test("piiCount finds emails, phones, and IPs; clean text scores 0") {
    import spark.implicits._
    val d = Seq(
      "mail Bob.Smith+x@Example.COM or call 555-123-4567 and 555.987.6543",
      "host 10.0.3.17 and 192.168.0.1 up",
      "no pii here at all",
    ).toDF("t")
    val got = d.select(
      piiCount(col("t"), emailRe).as("e"),
      piiCount(col("t"), phoneRe).as("p"),
      piiCount(col("t"), ipv4Re).as("i"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got(0) === ((1L, 2L, 0L)))
    assert(got(1) === ((0L, 0L, 2L)))
    assert(got(2) === ((0L, 0L, 0L)))
  }

  test("redactPii replaces every occurrence, email before numbers") {
    import spark.implicits._
    val out = Seq("write a1-b2@x.io; dial 555-123-4567; ping 10.0.0.1 ok")
      .toDF("t").select(redactPii(col("t")).as("r")).head().getString(0)
    assert(out === "write <email>; dial <phone>; ping <ip> ok")
    // an address whose local part looks like a phone is consumed as an
    // email — the order the chain guarantees
    val tricky = Seq("ref 555-123-4567@x.io end").toDF("t")
      .select(redactPii(col("t")).as("r")).head().getString(0)
    assert(tricky === "ref <email> end")
  }
}
