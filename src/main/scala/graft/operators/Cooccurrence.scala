package graft.operators

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Token co-occurrence statistics (PMI) — the association-mining step
  * behind collocation extraction, phrase detection, and word-vector
  * preprocessing (word2vec-style skip-gram counting).
  *
  * Scale shape: pair GENERATION is map-side — every (w1, w2) pair
  * within the window is emitted from the tokens array inside the scan
  * stage, never via a positional self-join of an exploded token table
  * (which would shuffle one row per token and join on (doc, pos) —
  * corpus-sized work for a per-row computation). The only shuffles are
  * the pair-count and unigram-count groupBys plus ONE token-keyed
  * melt-join of pair counts to unigram counts; the corpus-total
  * token/pair counts ride a 1-row broadcast computed arithmetically
  * from per-doc token counts. Like [[LanguageModel]], the count tables
  * grow with the vocabulary and deliberately do NOT broadcast.
  */
object Cooccurrence {

  /** One row per ordered skip-gram occurrence: (doc_id, w1, w2) for
    * every token pair at distance 1..`window` (w1 precedes w2).
    * Documents with < 2 tokens drop out. The tokens array materializes
    * once; distances then positions explode as two Generate stages and
    * the (w1, w2) extraction runs in the codegen'd projection after —
    * the previous nested transform-in-transform was doubly interpreted
    * (CodegenFallback), the HOF cost the bigram/span paths avoid the
    * same way. */
  def skipgrams(docs: DataFrame, idCol: String, textCol: String,
      window: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    docs
      .select(col(idCol).as("doc_id"), TF.tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), col("toks"), explode(
        sequence(lit(1), least(lit(window), size(col("toks")) - 1)))
        .as("d"))
      .select(col("doc_id"), col("toks"), col("d"), explode(
        sequence(lit(1), size(col("toks")) - col("d"))).as("i"))
      .select(col("doc_id"),
        element_at(col("toks"), col("i")).as("w1"),
        element_at(col("toks"), col("i") + col("d")).as("w2"))
  }

  /** Pointwise mutual information per frequent skip-gram pair:
    * pmi = ln( (c12/B) / ((c1/T)·(c2/T)) ), with B the corpus skip-gram
    * total and T the corpus token total. Counts are exact integers;
    * the one floating-point step runs in identical expression order in
    * any engine. Pairs below `minPairCount` are cut BEFORE the unigram
    * joins — the classic frequency cut that also bounds the join width. */
  def pmi(docs: DataFrame, idCol: String, textCol: String,
      window: Int, minPairCount: Long): DataFrame = {
    val sg = skipgrams(docs, idCol, textCol, window)
    val pairs = sg.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val uni = docs
      .select(explode(TF.tokens(col(textCol))).as("t"))
      .groupBy("t").agg(count(lit(1)).as("c"))
    // Corpus totals B = Σ c12 and T = Σ c are pure arithmetic over the
    // per-doc token COUNT — a doc with n tokens emits n unigrams and
    // Σ_{d=1..min(w,n-1)} (n−d) = k·n − k(k+1)/2 skip-grams (k =
    // min(w, n−1)). Computing them from `size(tokens)` in one cheap
    // map-side agg means the expensive explode+groupBy subtrees above
    // each execute exactly ONCE per action (they previously also fed
    // the totals, doubling the heaviest stage — no persist needed).
    // null text ⇒ size() is null (or -1 under the legacy flag): clamp
    // to 0 so such docs contribute nothing, matching the explode paths
    val perDoc = docs
      .select(greatest(coalesce(size(TF.tokens(col(textCol))), lit(0)),
        lit(0)).as("n"))
      .select(col("n").cast("long").as("n"),
        least(lit(window.toLong), greatest(col("n") - 1L, lit(0L))).as("k"))
    val totals = perDoc.agg(
      sum(col("k") * col("n") - expr("(k * (k + 1)) DIV 2")).as("b"),
      sum(col("n")).as("t_total"))
    val pmiExpr = log(
      (col("c12").cast("double") / col("b").cast("double")) /
        ((col("c1").cast("double") / col("t_total").cast("double")) *
          (col("c2").cast("double") / col("t_total").cast("double"))))
    // Melt-join: each surviving pair emits (side, token) rows and joins
    // the unigram table ONCE, then folds back to one row per pair. Two
    // token-keyed joins (w1 then w2) would run the corpus-wide unigram
    // explode+groupBy subtree twice — the melt trades that second
    // corpus pass for a shuffle of 2·|pairs| post-frequency-cut rows,
    // which is orders of magnitude smaller at any scale.
    val melted = pairs.filter(col("c12") >= minPairCount)
      .select(col("w1"), col("w2"), col("c12"),
        explode(array(
          struct(lit(1).as("side"), col("w1").as("t")),
          struct(lit(2).as("side"), col("w2").as("t")))).as("m"))
      .select(col("w1"), col("w2"), col("c12"),
        col("m.side").as("side"), col("m.t").as("t"))
    melted.join(uni, "t")
      .groupBy("w1", "w2", "c12")
      .agg(max(when(col("side") === 1, col("c"))).as("c1"),
        max(when(col("side") === 2, col("c"))).as("c2"))
      .crossJoin(broadcast(totals))
      .select(col("w1"), col("w2"), col("c12"), col("c1"), col("c2"),
        round(pmiExpr, 4).as("pmi"))
  }
}
