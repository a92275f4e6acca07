package graft.operators

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-based bigram language model: train token-transition counts on
  * a reference corpus, score every document by its average per-bigram
  * log-likelihood — the perplexity-style quality signal training-data
  * pipelines use to filter gibberish and off-language text (documents
  * that "look like" the reference corpus score high).
  *
  * Model: Laplace-smoothed bigram MLE,
  *   P(w2 | w1) = (c(w1,w2) + 1) / (c(w1,·) + V),
  * with c(w1,·) the count of w1 in bigram-first position (so the
  * conditional sums to 1 over the vocabulary) and V the reference
  * corpus's distinct-token count.
  *
  * Scale shape: counts are explode → map-side-combinable groupBys; the
  * scoring path shuffle-joins document bigrams against the count tables
  * on (w1, w2) then w1 — the model tables grow with the corpus
  * vocabulary and deliberately do NOT broadcast (same policy as
  * [[RelevanceScoring.tfidf]]); V rides a 1-row broadcast. Per-bigram
  * log contributions are summed in decimal so the per-doc result is
  * partition-order-independent (float sums are not reproducible,
  * decimal sums are).
  */
object LanguageModel {

  /** One row per bigram OCCURRENCE: (doc_id, w1, w2). Documents with
    * fewer than 2 tokens have no bigrams and drop out. The positions
    * are exploded and the (w1, w2) extraction happens in the codegen'd
    * projection AFTER the explode — building the pair structs inside a
    * transform() lambda is interpreted (CodegenFallback), the HOF cost
    * the MinHash/span paths avoid the same way. */
  def docBigrams(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), TF.tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(1), size(col("toks")) - 1)).as("i"))
      .select(col("doc_id"),
        element_at(col("toks"), col("i")).as("w1"),
        element_at(col("toks"), col("i") + 1).as("w2"))

  /** (doc_id, n_bigrams, avg_ll): average Laplace-smoothed bigram
    * log-likelihood of every document in `docs` (≥ 1 bigram) under the
    * model trained on `train`. */
  def bigramLogLik(docs: DataFrame, train: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val trainBg = docBigrams(train, idCol, textCol)
    // c12 feeds BOTH score joins (directly, and through c1) —
    // checkpoint the aggregated table once so the train-side
    // explode+groupBy subtree executes once per action, not twice
    // (same policy, and same persist-vs-checkpoint reasoning, as
    // Dedup.minhashPairsScored).
    val c12 = trainBg.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      .localCheckpoint(true)
    val c1 = c12.groupBy("w1").agg(sum(col("c12")).as("c1"))
    val vocab = train
      .select(explode(TF.tokens(col(textCol))).as("t"))
      .agg(countDistinct(col("t")).as("vocab"))
    val lp = log(
      (coalesce(col("c12"), lit(0L)) + lit(1L)).cast("double") /
        (coalesce(col("c1"), lit(0L)) + col("vocab")).cast("double"))
    docBigrams(docs, idCol, textCol)
      .join(c12, Seq("w1", "w2"), "left")
      .join(c1, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"), lp.cast("decimal(38,12)").as("lp"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("lp")).cast("double") / count(lit(1)), 4)
          .as("avg_ll"))
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling": select raw-corpus
    * examples with probability ∝ p_target(x)/p_raw(x), both densities
    * estimated by cheap n-gram LMs): every document in `docs` is scored
    * under a TARGET bigram model (trained on `target`) and a RAW model
    * (trained on `raw`), and `logw = avg_ll_target − avg_ll_raw` is the
    * per-bigram log importance ratio (length-normalized so logw is
    * bounded and comparable across document lengths).
    *
    * Scale shape: the corpus bigram explode runs ONCE — the two
    * models' count tables are pre-merged by key (c12 tables full-outer
    * on (w1,w2), c1 tables on w1), so scoring under both densities
    * costs the same two vocabulary-keyed joins as scoring under one
    * ([[bigramLogLik]] called twice would pay the corpus explode and
    * both join chains twice). Model tables grow with vocabulary and
    * deliberately do NOT broadcast; the two vocab sizes ride a 1-row
    * broadcast. Per-bigram logs sum in decimal (partition-order
    * independent), and all derived floats round to 4 dp so the output
    * replays engine-for-engine.
    *
    * Returns (doc_id, n_bigrams, avg_ll_target, avg_ll_raw, logw). */
  def importanceWeights(docs: DataFrame, target: DataFrame,
      raw: DataFrame, idCol: String, textCol: String): DataFrame = {
    def model(train: DataFrame): (DataFrame, DataFrame, DataFrame) = {
      val bg = docBigrams(train, idCol, textCol)
      val c12 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
        .localCheckpoint(true)
      val c1 = c12.groupBy("w1").agg(sum(col("c12")).as("c1"))
      val vocab = train
        .select(explode(TF.tokens(col(textCol))).as("t"))
        .agg(countDistinct(col("t")).as("vocab"))
      (c12, c1, vocab)
    }
    val (c12t, c1t, vt) = model(target)
    val (c12r, c1r, vr) = model(raw)
    val c12 = c12t.withColumnRenamed("c12", "c12_t")
      .join(c12r.withColumnRenamed("c12", "c12_r"),
        Seq("w1", "w2"), "full_outer")
    val c1 = c1t.withColumnRenamed("c1", "c1_t")
      .join(c1r.withColumnRenamed("c1", "c1_r"), Seq("w1"), "full_outer")
    val vocabs = vt.withColumnRenamed("vocab", "vocab_t")
      .crossJoin(vr.withColumnRenamed("vocab", "vocab_r"))
    scoreUnderMergedModels(docs, c12, c1, vocabs, idCol, textCol)
  }

  /** DSIR fast path for the shape DSIR actually prescribes (Xie et al.
    * 2023 §2: raw IS the corpus being resampled): target =
    * `docs WHERE isTarget`, raw = `docs`. Both count tables come out of
    * ONE bigram explode and ONE (w1, w2) shuffle as conditional counts
    * — the raw count of each pair and its target-restricted count — so
    * the two-frame form's second corpus explode, second count shuffle,
    * second vocab explode, and both full-outer merge joins disappear.
    * The arithmetic is unchanged bit for bit: a pair or prefix with no
    * target occurrences counts 0 exactly where the full-outer merge
    * produced null → coalesce 0, and `countDistinct(when(isTarget, t))`
    * is the target slice's vocabulary. Only valid because target ⊆ raw
    * by construction; arbitrary target/raw frames must use the general
    * [[importanceWeights]]. */
  def importanceWeightsSelf(docs: DataFrame, isTarget: Column,
      idCol: String, textCol: String): DataFrame = {
    val bg = docs
      .select(isTarget.cast("boolean").as("is_t"),
        TF.tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("is_t"), col("toks"),
        explode(sequence(lit(1), size(col("toks")) - 1)).as("i"))
      .select(col("is_t"),
        element_at(col("toks"), col("i")).as("w1"),
        element_at(col("toks"), col("i") + 1).as("w2"))
    // same checkpoint policy as the general form: pin the AGGREGATED
    // table (vocab²-bounded), never the raw explode (corpus-sized)
    val c12 = bg.groupBy("w1", "w2").agg(
      count(when(col("is_t"), 1)).as("c12_t"),
      count(lit(1)).as("c12_r")).localCheckpoint(true)
    val c1 = c12.groupBy("w1").agg(
      sum(col("c12_t")).as("c1_t"), sum(col("c12_r")).as("c1_r"))
    val vocabs = docs
      .select(isTarget.cast("boolean").as("is_t"),
        explode(TF.tokens(col(textCol))).as("t"))
      .agg(countDistinct(when(col("is_t"), col("t"))).as("vocab_t"),
        countDistinct(col("t")).as("vocab_r"))
    // Self-form-only join collapse: target ⊆ raw = docs means EVERY
    // scored bigram is in c12 (it was counted from these very rows),
    // so the prefix counts can ride the pair table — one model⋈model
    // join on w1 (both vocab-bounded) replaces the second
    // corpus-occurrence-level join of the scoring chain (guide §2.3:
    // shuffle/probe fewer bytes — the occurrence stream is the big
    // side). The general two-frame form keeps the two-join shape: a
    // scored bigram absent from c12 but with a known prefix still
    // needs the c1 fallback there.
    val model = c12.join(c1, Seq("w1"))
    scoreUnderMergedModelSingleJoin(docs, model, vocabs, idCol, textCol)
  }

  /** [[scoreUnderMergedModels]] for callers that GUARANTEE every scored
    * bigram appears in the merged model table (the self-trained DSIR
    * form): one (w1, w2) join carries pair and prefix counts both. */
  private def scoreUnderMergedModelSingleJoin(docs: DataFrame,
      model: DataFrame, vocabs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    def lp(c12c: String, c1c: String, vc: String) = log(
      (coalesce(col(c12c), lit(0L)) + lit(1L)).cast("double") /
        (coalesce(col(c1c), lit(0L)) + col(vc)).cast("double"))
    val scored = docBigrams(docs, idCol, textCol)
      .join(model, Seq("w1", "w2"), "left")
      .crossJoin(broadcast(vocabs))
      .select(col("doc_id"),
        lp("c12_t", "c1_t", "vocab_t").cast("decimal(38,12)").as("lp_t"),
        lp("c12_r", "c1_r", "vocab_r").cast("decimal(38,12)").as("lp_r"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("lp_t")).cast("double") / count(lit(1)), 4)
          .as("avg_ll_target"),
        round(sum(col("lp_r")).cast("double") / count(lit(1)), 4)
          .as("avg_ll_raw"))
    scored.withColumn("logw",
      round(col("avg_ll_target") - col("avg_ll_raw"), 4))
  }

  /** Shared scoring tail: join document bigrams against the merged
    * two-model count tables and reduce to per-doc average
    * log-likelihoods + logw (decimal sums, 4-dp rounding — see
    * [[importanceWeights]] doc). */
  private def scoreUnderMergedModels(docs: DataFrame, c12: DataFrame,
      c1: DataFrame, vocabs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    def lp(c12c: String, c1c: String, vc: String) = log(
      (coalesce(col(c12c), lit(0L)) + lit(1L)).cast("double") /
        (coalesce(col(c1c), lit(0L)) + col(vc)).cast("double"))
    val scored = docBigrams(docs, idCol, textCol)
      .join(c12, Seq("w1", "w2"), "left")
      .join(c1, Seq("w1"), "left")
      .crossJoin(broadcast(vocabs))
      .select(col("doc_id"),
        lp("c12_t", "c1_t", "vocab_t").cast("decimal(38,12)").as("lp_t"),
        lp("c12_r", "c1_r", "vocab_r").cast("decimal(38,12)").as("lp_r"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("lp_t")).cast("double") / count(lit(1)), 4)
          .as("avg_ll_target"),
        round(sum(col("lp_r")).cast("double") / count(lit(1)), 4)
          .as("avg_ll_raw"))
    // logw from the ROUNDED averages: exact 4-dp arithmetic, so the
    // downstream selection key is engine-portable by construction
    scored.withColumn("logw",
      round(col("avg_ll_target") - col("avg_ll_raw"), 4))
  }
}
