package graft.operators

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gopher-style quality rule battery (Rae et al. 2021 §A1.1; the
  * bullet/ellipsis line rules are shared with C4) — the published
  * LLM-corpus filter set as one map-only codegen'd regex projection.
  *
  * Every metric is an exact integer count and every threshold an
  * integer cross-multiplication (10·symbols ≤ words rather than
  * symbols/words ≤ 0.1), so the flags — not just the counts — are
  * engine-exact with no float at any cut line. Line rules use (?m)
  * anchors over the raw text — one regex pass per rule, no per-line
  * explode, no interpreted lambda filter. Being a pure projection it
  * runs identically over a batch scan or a micro-batch stream
  * ([[graft.streaming.DocsStream.streamingQualityGate]]); at 100 TB it
  * runs at read speed and the pass flag is the partition-local filter
  * every downstream stage reuses.
  */
object QualityRules {

  /** The Gopher required-stopword list: a doc must contain at least 2
    * of these 8 English function words. */
  val gopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Metrics + rule flags over a (doc_id, text, norm_text) frame;
    * `keep` columns pass through untouched (e.g. lang/source for
    * downstream grouping). */
  def gopherMetrics(df: DataFrame, keep: Seq[String] = Nil): DataFrame = {
    val m = df.select(
      (col("doc_id") +: keep.map(col)) ++ Seq(
      TF.tokenCount(col("text")).as("n_words"),
      // Σ word lengths ≡ count of non-whitespace chars (words are the
      // \s+-split runs) — one regex strip, no per-token fold
      length(regexp_replace(col("text"), "\\s+", "")).cast("long")
        .as("n_word_chars"),
      (length(col("text")) - length(regexp_replace(col("text"), "#", ""))
        + size(regexp_extract_all(col("text"), lit("(\\.\\.\\.|…)"),
          lit(0)))).cast("long").as("n_symbols"),
      size(split(col("text"), "\n", -1)).cast("long").as("n_lines"),
      size(regexp_extract_all(col("text"), lit("(?m)^[ \\t]*[-*•]"),
        lit(0))).cast("long").as("n_bullet_lines"),
      size(regexp_extract_all(col("text"),
        lit("(?m)(\\.\\.\\.|…)[ \\t]*$"), lit(0))).cast("long")
        .as("n_ellipsis_lines"),
      // a \S+ token matches (\S*[A-Za-z]\S*) exactly once iff it
      // contains a letter — matches cannot cross whitespace
      size(regexp_extract_all(col("text"), lit("\\S*[A-Za-z]\\S*"),
        lit(0))).cast("long").as("n_alpha_words"),
      size(array_intersect(array_distinct(TF.tokens(col("norm_text"))),
        array(gopherStopwords.map(lit(_)): _*))).cast("long")
        .as("n_req_stopwords")): _*)
    m.select(col("*"),
      (col("n_words") >= 50L && col("n_words") <= 100000L)
        .as("r_word_count"),
      (col("n_word_chars") >= lit(3L) * col("n_words") &&
        col("n_word_chars") <= lit(10L) * col("n_words"))
        .as("r_mean_word_len"),
      (lit(10L) * col("n_symbols") <= col("n_words")).as("r_symbol_ratio"),
      (lit(10L) * col("n_bullet_lines") <= lit(9L) * col("n_lines"))
        .as("r_bullet"),
      (lit(10L) * col("n_ellipsis_lines") <= lit(3L) * col("n_lines"))
        .as("r_ellipsis"),
      (lit(5L) * col("n_alpha_words") >= lit(4L) * col("n_words"))
        .as("r_alpha_words"),
      (col("n_req_stopwords") >= 2L).as("r_stopwords"))
      .withColumn("gopher_pass",
        col("r_word_count") && col("r_mean_word_len") &&
          col("r_symbol_ratio") && col("r_bullet") && col("r_ellipsis") &&
          col("r_alpha_words") && col("r_stopwords"))
  }
}
