package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, quality signals, language ID, fingerprinting.
  *
  * Everything here is a pure `Column` combinator over built-in Catalyst
  * expressions (higher-order array functions, regexp, hash) — fully
  * codegen'd, no UDFs, so whole-stage codegen spans survive and the same
  * code runs unchanged on a 1000-executor cluster. The reference
  * (srini-x/nyc-taxi-data-clickhouse) has no text surface; these are the
  * LLM-pipeline extensions from SURVEY.md §7.4.
  */
object TextFunctions {

  /** Whitespace tokens of trimmed text; empty/blank text → empty array. */
  def tokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  /** Whitespace token count (matches DuckDB
    * `len(regexp_extract_all(text,'\S+'))`). */
  def tokenCount(text: Column): Column =
    size(tokens(text)).cast("long")

  /** BPE-ish tokenizer proxy: alpha runs, digit runs, and single
    * non-alnum marks each count as one token — a deterministic stand-in
    * for subword tokenizers with the same order of magnitude. */
  def regexTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"),
      lit(0))).cast("long")

  /** Fraction of characters that are ASCII punctuation. */
  def punctRatio(text: Column): Column =
    length(regexp_replace(text, "[^!-/:-@\\[-`{-~]", "")).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  /** Fraction of characters that are whitespace. */
  def whitespaceRatio(text: Column): Column =
    length(regexp_replace(text, "\\S", "")).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  /** Mean token length in characters (0 for empty docs). Tokens are
    * the \s+-split runs, so Σ token lengths ≡ the count of
    * non-whitespace characters — one codegen'd regex strip instead of
    * an interpreted per-element aggregate() fold. */
  def meanTokenLen(text: Column): Column = {
    val nTok = tokenCount(text)
    when(nTok === 0, lit(0.0)).otherwise(
      length(regexp_replace(text, "\\s", "")).cast("double") /
        nTok.cast("double"))
  }

  /** Tiny per-language stopword lists for the n-gram/stopword language-ID
    * heuristic. Deterministic, heuristic-quality by design. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "that", "it", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "los", "se", "por"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "en", "un", "du", "une"),
    "de" -> Seq("der", "die", "und", "das", "von", "zu", "mit", "den", "ist", "ein"),
  )

  /** Count of tokens belonging to `lang`'s stopword list — one
    * imperative hash-set pass ([[TokenSetCount]]; ≡ the interpreted
    * `size(filter(toks, isin(...)))` it replaces). */
  def stopwordHits(text: Column, lang: String): Column =
    StopwordFunctions.tokenSetCount(tokens(lower(text)), stopwords(lang))

  /** Stopword ratio against the union of all lists (quality signal). */
  def stopwordRatio(text: Column): Column = {
    val all = stopwords.values.flatten.toSeq.distinct
    StopwordFunctions.tokenSetCount(tokens(lower(text)), all).cast("double") /
      greatest(size(tokens(text)), lit(1)).cast("double")
  }

  /** Occurrences of any word from a banned list (C4-style content
    * filter): whole-token regex matches over the lowercased text. The
    * alternation compiles once into the codegen'd RegExpCount — no UDF,
    * no per-row list scan. Word-boundary semantics are identical in
    * Java regex and RE2, so the DuckDB oracle replays it verbatim. */
  def bannedHits(text: Column, words: Seq[String]): Column = {
    require(words.nonEmpty, "banned list must be non-empty")
    regexp_count(lower(text),
      lit(words.mkString("\\b(", "|", ")\\b"))).cast("long")
  }

  /** PII patterns, shared verbatim by the Column combinators and the
    * DuckDB oracle SQL (single source of truth; RE2-compatible syntax —
    * char classes, bounded counts, word boundaries — so Java regex and
    * RE2 agree match-for-match). All are applied to lowercased text. */
  val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val phoneRe = "\\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\\b"
  val ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** Occurrences of one PII pattern in the lowercased text. */
  def piiCount(text: Column, pattern: String): Column =
    regexp_count(lower(text), lit(pattern)).cast("long")

  /** Redact emails, then phones, then IPv4s (that order: an email or
    * phone containing digit runs must be consumed before the broader
    * numeric patterns see them) — the C4-style scrub step before
    * training export. Codegen'd regexp_replace chain, no UDF. */
  def redactPii(text: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(lower(text),
      emailRe, "<email>"), phoneRe, "<phone>"), ipv4Re, "<ip>")

  /** Heuristic language ID: argmax of per-language stopword hits, "und"
    * (undetermined) when nothing matches. Ties break on reverse-alpha
    * order — deterministic. One tokenize + one imperative pass over
    * the tokens ([[BestStopwordLang]]); the previous
    * greatest-of-structs form re-tokenized and re-filtered once per
    * language, each filter interpreted per element. */
  def langId(text: Column): Column =
    StopwordFunctions.bestStopwordLang(tokens(lower(text)),
      stopwords.keys.toSeq.sorted.map(l => l -> stopwords(l)))

  /** Composite quality score in [0,1]: length credit, punctuation
    * penalty, stopword credit. Weights are arbitrary but fixed. */
  def qualityScore(text: Column): Column =
    round(
      least(length(text).cast("double") / lit(500.0), lit(1.0)) * 0.4
        + (lit(1.0) - least(punctRatio(text) * 5.0, lit(1.0))) * 0.3
        + least(stopwordRatio(text) * 4.0, lit(1.0)) * 0.3,
      4)

  /** Canonical normalized form: lowercase, punctuation stripped,
    * whitespace collapsed. */
  def normalize(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9\\s]", " "), "\\s+", " "))

  /** Content fingerprint: md5 of the normalized text — identical to
    * DuckDB `md5(...)`, so exact-dedup keys are oracle-checkable. */
  def fingerprint(text: Column): Column = md5(normalize(text).cast("binary"))

  /** Modular rolling (polynomial) hash over the normalized characters:
    * h = (h*31 + code) mod 1e9+7 — a Karp-Rabin-style document
    * fingerprint, one imperative byte loop per row
    * ([[RollingHash]]; the previous aggregate() fold was interpreted
    * per character). Modular (not wrapping) so engines without
    * wrapping int64 arithmetic compute the identical value. */
  def rollingHash(text: Column): Column =
    RollingHashFunctions.rollingHash(normalize(text))

  /** Word n-gram shingles from a MATERIALIZED tokens column. `toks`
    * must be a bound attribute, not a nested expression: higher-order
    * array functions evaluate interpreted (no codegen), so a nested
    * tokenizer expression would be re-evaluated per lambda element —
    * O(tokens²) per row. Shingle each stage from the previous stage's
    * materialized column instead. */
  def shinglesFromTokens(toks: Column, n: Int): Column =
    when(size(toks) === 0, array().cast("array<string>"))
      .when(size(toks) <= n, array(concat_ws(" ", toks)))
      .otherwise(transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))

  /** Word n-gram shingles of raw text — convenience for small inputs;
    * hot paths should materialize tokens first (see
    * [[shinglesFromTokens]]). */
  def wordShingles(text: Column, n: Int): Column =
    shinglesFromTokens(tokens(text), n)

  /** Character n-gram shingles of the normalized text. */
  def charNgrams(text: Column, n: Int): Column = {
    val norm = normalize(text)
    when(length(norm) < n, array(norm))
      .otherwise(transform(
        sequence(lit(1), length(norm) - (n - 1)),
        i => substr(norm, i, lit(n))))
  }
}
