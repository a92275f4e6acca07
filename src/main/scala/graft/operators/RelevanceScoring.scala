package graft.operators

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus relevance scoring: term/document frequencies, smoothed
  * TF-IDF, and Okapi BM25 — the ranking/quality signals a training-data
  * pipeline uses for query-based corpus filtering ("keep documents
  * relevant to topic X") and boilerplate downweighting.
  *
  * Scale shape: term frequencies are one explode + one map-side
  * combinable groupBy on (doc, term); document frequencies for a QUERY
  * are computed after filtering to the query's terms, so the df table
  * is |query| rows and broadcasts; per-document length/score joins hash
  * on doc id. Nothing is ever collected; the global N/avgdl statistics
  * ride a 1-row broadcast cross join. Exact integer accumulation
  * (counts as longs, score sums in decimal) keeps results
  * order-independent — float sums over shuffled partitions are not
  * reproducible, decimals are.
  */
object RelevanceScoring {

  /** (doc_id, term, tf) — term frequencies over whitespace tokens of a
    * pre-normalized text column. */
  def termFreqs(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      explode(TF.tokens(col(textCol))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))

  /** (doc_id, dl) token counts per document. */
  def docLengths(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      TF.tokenCount(col(textCol)).as("dl"))

  /** Okapi BM25 score of every document against a bag of query terms
    * (docs with score 0 — no query term present — are omitted).
    * idf = ln(1 + (N − df + 0.5)/(df + 0.5)), the standard
    * negative-proof smoothing. Scores are rounded to 4 decimals after
    * an exact decimal sum over the per-term contributions. */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    // lens feeds the corpus stats AND the per-doc join; tfq feeds the
    // df aggregate AND the scoring join — checkpoint both so each
    // tokenize+explode pass over the corpus runs once per action, not
    // twice (the plan showed documents scanned 4× before this; same
    // checkpoint-not-persist policy as Dedup.minhashPairsScored).
    val lens = docLengths(docs, idCol, textCol).localCheckpoint(true)
    // exact avgdl: integer sum / count, one double division
    val stats = lens.agg(
      count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val tfq = termFreqs(docs, idCol, textCol)
      .filter(col("term").isin(queryTerms: _*))
      .localCheckpoint(true)
    val dfs = tfq.groupBy("term").agg(count(lit(1)).as("df"))
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val tfNorm = (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) *
        (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
    tfq
      .join(broadcast(dfs), Seq("term"))
      .join(lens, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        (idf * tfNorm).cast("decimal(38,12)").as("contrib"))
      .groupBy("doc_id")
      .agg(round(sum(col("contrib")).cast("double"), 4).as("bm25"))
  }

  /** Smoothed TF-IDF per (doc, term), query-free:
    * tfidf = (1 + ln(tf)) · ln((N + 1)/(df + 1)). The full-vocabulary
    * df table shuffles on term (it does NOT broadcast at corpus scale —
    * vocabulary grows with the data). */
  def tfidf(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // tf feeds the df aggregate AND the scoring join — checkpoint so
    // the full-vocabulary explode runs once per action (materializing
    // the (doc, term) table costs exactly what its shuffle already
    // moves; recomputing it costs a second corpus tokenize).
    val tf = termFreqs(docs, idCol, textCol).localCheckpoint(true)
    val dfs = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    tf.join(dfs, Seq("term"))
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("term"),
        round((lit(1.0) + log(col("tf"))) *
          log((col("n_docs") + lit(1.0)) / (col("df") + lit(1.0))), 4)
          .as("tfidf"))
  }

  /** All-pairs LEXICAL cosine similarity over df-pruned TF-IDF vectors
    * — the sparse-vector document-similarity path (the classic
    * all-pairs-similarity-search shape) beside the MinHash (set),
    * SimHash (bit), and embedding (dense) near-dup families. The
    * inverted index IS the join: pairs are generated per shared term,
    * so the fan-out is Σ_term df² — which is why the df cap is not a
    * quality nicety but THE scale bound (a stopword-grade term at
    * 100 TB would alone emit ~N² pairs). The cap is ABSOLUTE, not a
    * corpus fraction, and that is load-bearing: Σ_term df² ≤
    * |vocab|·maxDf² no matter how big the corpus grows, and no term
    * group exceeds maxDf rows so the term-keyed shuffle is skew-free
    * by construction. (A fractional cap keeps terms whose df scales
    * with N — quadratic at EVERY scale factor; measured: the 0.8·N
    * form ran 560M join rows at sf0.1 on this fixed-vocabulary
    * corpus.) Weights are the 4-dp-rounded TF-IDF values — engine-exact
    * doubles — so pair dot products and squared norms accumulate as
    * exact decimals (order-independent), with one double
    * divide+sqrt+round at the end: the whole pair list hash-checks.
    * Cosine is over the PRUNED vector space (norms from surviving
    * terms), the standard all-pairs formulation. */
  def sparseCosinePairs(docs: DataFrame, idCol: String, textCol: String,
      maxDf: Long = 400L, minCos: Double = 0.9): DataFrame = {
    require(maxDf > 0, s"maxDf must be positive, got $maxDf")
    val tf = termFreqs(docs, idCol, textCol).localCheckpoint(true)
    val dfs = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    // surviving (doc, term, weight) postings feed the norm aggregate
    // AND both sides of the pair join — checkpoint once (vocab-keyed
    // df join deliberately not broadcast: vocabulary grows with data)
    val w = tf.join(dfs, Seq("term"))
      .crossJoin(broadcast(n))
      .filter(col("df") <= lit(maxDf))
      .select(col("doc_id"), col("term"),
        round((lit(1.0) + log(col("tf"))) *
          log((col("n_docs") + lit(1.0)) / (col("df") + lit(1.0))), 4)
          .as("wt"))
      .localCheckpoint(true)
    val norms = w.groupBy("doc_id")
      .agg(sum((col("wt") * col("wt")).cast("decimal(38,12)")).as("n2"))
    val pairs = w.as("a").join(w.as("b"),
        col("a.term") === col("b.term") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        (col("a.wt") * col("b.wt")).cast("decimal(38,12)").as("p"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("n_shared"), sum(col("p")).as("d"))
    pairs
      .join(norms.select(col("doc_id").as("doc_a"), col("n2").as("n2a")),
        Seq("doc_a"))
      .join(norms.select(col("doc_id").as("doc_b"), col("n2").as("n2b")),
        Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("n_shared"),
        round(col("d").cast("double") /
          (sqrt(col("n2a").cast("double")) *
            sqrt(col("n2b").cast("double"))), 4).as("cos"))
      .filter(col("cos") >= minCos)
  }
}
