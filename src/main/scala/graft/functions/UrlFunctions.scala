package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the key step of crawl-level dedup: the same
  * page arrives as `HTTP://WWW.Site.com:80/a/?utm_source=x&b=2&a=1#top`
  * and `http://site.com/a?a=1&b=2`, and a web-scale corpus dedups on
  * the CANONICAL form, not the raw string. Everything here is pure
  * codegen'd Column combinators (regexp extraction + array HOFs), so
  * canonicalization runs at scan speed with no UDF and no shuffle —
  * at 100 TB this is a free map stage feeding the real dedup
  * (groupBy canonical URL).
  *
  * Rules (each deliberately engine-replayable, ASCII-lexicographic):
  *   1. strip the fragment (`#...`);
  *   2. lowercase scheme and host; strip a leading `www.`;
  *   3. drop the default port (`:443` for https, `:80` for http);
  *   4. strip trailing slashes from the path; empty path → `/`;
  *   5. drop `utm_*` tracking parameters and empty params, SORT the
  *      rest (query order never distinguishes pages), drop an empty
  *      query entirely.
  */
object UrlFunctions {

  private val schemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"
  private val hostRe = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"
  private val pathRe = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)"

  /** Canonical form of an absolute http(s) URL column. */
  def canonicalizeUrl(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, schemeRe, 1))
    val host0 = regexp_replace(
      lower(regexp_extract(noFrag, hostRe, 1)), "^www\\.", "")
    val host = when(scheme === "https", regexp_replace(host0, ":443$", ""))
      .when(scheme === "http", regexp_replace(host0, ":80$", ""))
      .otherwise(host0)
    val path0 = regexp_replace(
      regexp_extract(noFrag, pathRe, 1), "/+$", "")
    val path = when(path0 === "", lit("/")).otherwise(path0)
    val qs = regexp_extract(noFrag, "\\?([^#]*)", 1)
    val params = array_sort(filter(split(qs, "&"),
      p => p =!= "" && !p.startsWith("utm_")))
    val query = when(size(params) === 0, lit(""))
      .otherwise(concat(lit("?"), array_join(params, "&")))
    concat(scheme, lit("://"), host, path, query)
  }
}
