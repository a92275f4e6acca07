package graft.queries

import graft.SparkSpec
import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Gopher-style quality rule battery: hand-built fixtures hit each rule
  * on both sides of its threshold; the sf corpus run cross-checks flag
  * consistency against independently recomputed counts. */
class GopherRulesSpec extends SparkSpec {

  private def metricsOf(docs: Seq[(Long, String)]) = {
    import spark.implicits._
    val df = docs.toDF("doc_id", "text")
      .withColumn("norm_text", TF.normalize(col("text")))
    graft.operators.QualityRules.gopherMetrics(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
  }

  private val fifty = (1 to 50).map(i => s"word$i").mkString(" ")

  test("each rule fires on its crafted violator and not on the good doc") {
    val good = fifty + " the be to of and"
    val docs = Seq(
      1L -> good,
      // too short (10 words, otherwise clean)
      2L -> ((1 to 8).map(i => s"word$i").mkString(" ") + " the be"),
      // mean word length > 10 (fifty 12-char words)
      3L -> ((1 to 50).map(_ => "abcdefghijkl").mkString(" ") + " the be"),
      // symbol-heavy: > 1 hash per 10 words
      4L -> (fifty + " the be " + (1 to 9).map(_ => "#tag").mkString(" ")),
      // every line a bullet (> 90%)
      5L -> (1 to 52).map(i => s"- item$i the be").mkString("\n"),
      // > 30% of lines end in ellipsis
      6L -> Seq(fifty + " the be", "trailing thought...", "another one…")
        .mkString("\n"),
      // numeric words: < 80% contain a letter
      7L -> (fifty + " the be " + (1 to 20).map(i => s"$i$i$i").mkString(" ")),
      // only 1 required stopword
      8L -> (fifty + " the the the"),
      9L -> "")
    val m = metricsOf(docs)
    assert(m(1L).getAs[Boolean]("gopher_pass"))
    Seq("r_word_count", "r_mean_word_len", "r_symbol_ratio", "r_bullet",
      "r_ellipsis", "r_alpha_words", "r_stopwords")
      .foreach(r => assert(m(1L).getAs[Boolean](r), r))
    assert(!m(2L).getAs[Boolean]("r_word_count"))
    assert(!m(3L).getAs[Boolean]("r_mean_word_len"))
    assert(m(3L).getAs[Boolean]("r_word_count"))
    assert(!m(4L).getAs[Boolean]("r_symbol_ratio"))
    assert(m(4L).getAs[Long]("n_symbols") === 9L)
    assert(!m(5L).getAs[Boolean]("r_bullet"))
    assert(m(5L).getAs[Long]("n_bullet_lines") === 52L)
    assert(!m(6L).getAs[Boolean]("r_ellipsis"))
    assert(m(6L).getAs[Long]("n_ellipsis_lines") === 2L)
    assert(m(6L).getAs[Long]("n_lines") === 3L)
    assert(!m(7L).getAs[Boolean]("r_alpha_words"))
    assert(!m(8L).getAs[Boolean]("r_stopwords"))
    assert(m(8L).getAs[Long]("n_req_stopwords") === 1L)
    // empty doc: 0 words, 1 line, word-count rule rejects; the
    // vacuous ratio rules hold (0 ≤ 0)
    assert(m(9L).getAs[Long]("n_words") === 0L)
    assert(m(9L).getAs[Long]("n_lines") === 1L)
    assert(!m(9L).getAs[Boolean]("r_word_count"))
    assert(!m(9L).getAs[Boolean]("gopher_pass"))
  }

  test("line anchors: indented bullets count, mid-line dots do not") {
    val m = metricsOf(Seq(
      1L -> "  - indented bullet\n\t* tab bullet\n• unicode bullet\nplain",
      2L -> "dots... in the middle\nand at the end..."))
    assert(m(1L).getAs[Long]("n_bullet_lines") === 3L)
    assert(m(1L).getAs[Long]("n_lines") === 4L)
    // '...' counts toward symbols wherever it sits, but only the
    // line-final one marks an ellipsis line
    assert(m(2L).getAs[Long]("n_symbols") === 2L)
    assert(m(2L).getAs[Long]("n_ellipsis_lines") === 1L)
  }

  test("sf corpus: flags reconcile with recomputed counts, single-line") {
    val rows = PipelineQueries.gopherRules(spark, sf()).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (w, wc) = (r.getAs[Long]("n_words"), r.getAs[Long]("n_word_chars"))
      assert(r.getAs[Long]("n_lines") === 1L)
      assert(r.getAs[Boolean]("r_word_count") === (w >= 50L && w <= 100000L))
      assert(r.getAs[Boolean]("r_mean_word_len") ===
        (wc >= 3 * w && wc <= 10 * w))
      assert(r.getAs[Boolean]("gopher_pass") ===
        Seq("r_word_count", "r_mean_word_len", "r_symbol_ratio", "r_bullet",
          "r_ellipsis", "r_alpha_words", "r_stopwords")
          .forall(r.getAs[Boolean](_)))
    }
    // the 50-word floor genuinely splits this corpus; the synthetic
    // vocabulary carries only 'the' from the required-stopword list,
    // so the ≥2 rule rejects every doc here — but the counter itself
    // must discriminate docs with vs without 'the'
    val passWc = rows.count(_.getAs[Boolean]("r_word_count"))
    assert(passWc > 0 && passWc < rows.length)
    assert(rows.map(_.getAs[Long]("n_req_stopwords")).distinct.sorted
      .toSeq === Seq(0L, 1L))
  }

  test("corpus card stats reconcile with direct computation") {
    val card = PipelineQueries.corpusCard(spark, sf()).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val src = graft.Tables.documents(spark, sf())
    assert(card("n_docs") === src.count())
    assert(card("n_langs") === src.select("lang").distinct().count())
    assert(card("n_sources") === src.select("source").distinct().count())
    val fps = src.select(TF.fingerprint(col("text"))).distinct().count()
    assert(card("n_exact_dup_docs") === src.count() - fps)
    assert(card("min_words") <= card("max_words"))
    assert(card("n_gopher_pass") <= card("n_docs"))
  }

  test("streaming quality gate equals the batch aggregation") {
    val streamed = graft.streaming.DocsStream
      .streamingQualityGate(spark, sf(), queryName = "gopher_gate_spec")
      .collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Boolean]("gopher_pass"))
        -> (r.getAs[Long]("n_docs"), r.getAs[Long]("n_words"))).toMap
    val batch = graft.operators.QualityRules.gopherMetrics(
      graft.Tables.documents(spark, sf())
        .withColumn("norm_text", TF.normalize(col("text"))),
      keep = Seq("lang"))
      .groupBy("lang", "gopher_pass")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_words")).as("n_words"))
      .collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Boolean]("gopher_pass"))
        -> (r.getAs[Long]("n_docs"), r.getAs[Long]("n_words"))).toMap
    assert(streamed === batch && streamed.nonEmpty)
    // every doc accounted for exactly once across (lang, pass) cells
    val total = graft.Tables.documents(spark, sf()).count()
    assert(streamed.values.map(_._1).sum === total)
  }
}
