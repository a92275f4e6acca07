package graft.operators

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-corpus decontamination: flag training documents that share
  * any word n-gram with a held-out evaluation set — the overlap check
  * every serious pretraining pipeline runs before training, so eval
  * numbers measure generalization rather than memorized test data.
  *
  * Scale shape: both sides reduce to DISTINCT (doc, n-gram) pairs via
  * explode + map-side-combinable distinct; the single expensive stage
  * is one equi-join shuffled on the n-gram. The eval side is typically
  * thousands of documents — its distinct n-gram set usually broadcasts
  * outright — while the training side streams through at any size.
  * For very long n-grams, hash them to 64-bit first (xxhash64) to
  * shuffle fixed-width keys; the raw-string form here keeps the DuckDB
  * oracle exact.
  */
object Decontamination {

  /** Distinct (id, ngram) pairs of a pre-normalized text column.
    * [[graft.functions.DistinctShingles]] dedups per document in its
    * one imperative pass, so exploding it yields (doc_id, ngram) pairs
    * that are unique BY CONSTRUCTION — no distinct() shuffle. */
  private def ngramPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"), TF.tokens(col(textCol)).as("toks"))
      .select(col("doc_id"), explode(graft.functions.ShingleFunctions
        .distinctShingles(col("toks"), n)).as("ngram"))

  /** Flagged training docs: (doc_id, n_shared) for every training doc
    * sharing ≥1 n-gram with the eval set. Join the output back with a
    * left-anti to actually drop them. */
  def flagOverlaps(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame = {
    val evalNg = ngramPairs(eval, idCol, textCol, n)
      .select(col("ngram")).distinct()
    ngramPairs(train, idCol, textCol, n)
      .join(evalNg, Seq("ngram"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Cross-source contamination matrix: for every pair of corpus
    * sources, how many DISTINCT n-grams they share — the dataset-card
    * audit that surfaces mirror sites, syndicated content, and scraped
    * duplicates BETWEEN sources before they melt into the training mix.
    *
    * Scale shape: sources reduce to distinct (source, ngram) pairs
    * (map-side combinable); the matrix is one self-equi-join shuffled
    * on the n-gram — never on the cross of sources — followed by a
    * pair-count aggregate whose output is |sources|² rows at most.
    * Canonicalized (src_a < src_b) so each pair appears once. */
  def sourceOverlapMatrix(docs: DataFrame, sourceCol: String,
      textCol: String, n: Int): DataFrame = {
    val sg = docs
      .select(col(sourceCol).as("src"), TF.tokens(col(textCol)).as("toks"))
      // per-doc dedup in the imperative shingle pass shrinks the rows
      // entering the cross-doc distinct's shuffle; the distinct() is
      // still needed to collapse ngrams repeated ACROSS a source's docs
      .select(col("src"), explode(graft.functions.ShingleFunctions
        .distinctShingles(col("toks"), n)).as("ngram"))
      .distinct()
    sg.as("a").join(sg.as("b"),
        col("a.ngram") === col("b.ngram") && col("a.src") < col("b.src"))
      .groupBy(col("a.src").as("src_a"), col("b.src").as("src_b"))
      .agg(count(lit(1)).as("shared_ngrams"))
  }

  /** The cleaned corpus: training docs with every flagged doc removed
    * (left-anti on the flag set — no row duplication). */
  def decontaminate(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame = {
    val flagged = flagOverlaps(train, eval, idCol, textCol, n)
      .select(col("doc_id").as("_flagged_id"))
    train.join(flagged, train(idCol) === col("_flagged_id"), "leftanti")
  }

  /** Serialized Bloom filter over the eval set's distinct n-gram hashes
    * — built with Spark's own mergeable [[org.apache.spark.sql.catalyst
    * .expressions.aggregate.BloomFilterAggregate]] (the sketch behind
    * runtime row-level filtering), so partials combine map-side and the
    * result is one binary blob sized `numBits` regardless of input. */
  def evalNgramBloom(eval: DataFrame, idCol: String, textCol: String,
      n: Int, estItems: Long = 1L << 20, numBits: Long = 1L << 23)
      : Array[Byte] = {
    import org.apache.spark.sql.GraftExpressionBridge.{catalystExpression, column}
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    val agg = column(new BloomFilterAggregate(
      catalystExpression(xxhash64(col("ngram"))),
      Literal(estItems), Literal(numBits)).toAggregateExpression())
    ngramPairs(eval, idCol, textCol, n)
      .select(col("ngram")).distinct()
      .agg(agg.as("bf"))
      .head().getAs[Array[Byte]](0)
  }

  /** [[flagOverlaps]] with a Bloom-filter pre-screen — the 100 TB form.
    *
    * The exact join shuffles EVERY distinct training (doc, n-gram) pair
    * on the n-gram, though almost none overlap the eval set. Here the
    * eval side is first reduced to a fixed-size Bloom filter (built in
    * one mergeable aggregate, a few MB at any eval size), shipped to
    * every scan task as a binary literal — the same constant-filter
    * shape Spark's own InjectRuntimeFilter produces, with the codegen'd
    * `might_contain` as the predicate — and only training n-grams the
    * filter might contain reach the shuffle. No false negatives, so the
    * follow-up exact join on the survivors returns EXACTLY
    * [[flagOverlaps]]'s answer (same oracle); false positives only cost
    * a few stray rows through the join, bounded by the filter's fpp.
    */
  def flagOverlapsBloom(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame = {
    import org.apache.spark.sql.GraftExpressionBridge.{catalystExpression, column}
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    val bf = evalNgramBloom(eval, idCol, textCol, n)
    val mightContain = column(BloomFilterMightContain(
      catalystExpression(lit(bf)),
      catalystExpression(xxhash64(col("ngram")))))
    val evalNg = ngramPairs(eval, idCol, textCol, n)
      .select(col("ngram")).distinct()
    ngramPairs(train, idCol, textCol, n)
      .filter(mightContain)
      .join(evalNg, Seq("ngram"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shared"))
  }
}
