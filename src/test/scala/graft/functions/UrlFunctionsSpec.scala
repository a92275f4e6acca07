package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** URL canonicalization rules, each pinned on a hand case. */
class UrlFunctionsSpec extends SparkSpec {

  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("url")
      .select(UrlFunctions.canonicalizeUrl(col("url")).as("c"))
      .collect().map(_.getString(0)).toSeq

  test("full gauntlet: case, www, default port, slash, utm, sort, fragment") {
    assert(canon("HTTP://WWW.Site.com:80/a/?utm_source=x&b=2&a=1#top")
      === Seq("http://site.com/a?a=1&b=2"))
  }

  test("https default port and root path") {
    assert(canon("https://site.com:443/", "https://site.com")
      === Seq("https://site.com/", "https://site.com/"))
  }

  test("non-default port is kept; inner slashes are kept") {
    assert(canon("https://site.com:8443/a//b///")
      === Seq("https://site.com:8443/a//b"))
  }

  test("all-utm query drops the ? entirely; empty params vanish") {
    assert(canon("http://a.com/x?utm_a=1&utm_b=2", "http://a.com/x?&&")
      === Seq("http://a.com/x", "http://a.com/x"))
  }

  test("distinct raw spellings of one page converge; distinct pages do not") {
    val merged = canon(
      "https://shop.example.com/p/1?b=2&a=1",
      "HTTPS://WWW.Shop.Example.COM:443/p/1/?a=1&utm_c=9&b=2#reviews")
    assert(merged.distinct.size === 1)
    assert(canon("https://shop.example.com/p/1?a=1",
      "https://shop.example.com/p/1?a=2").distinct.size === 2)
  }
}
