package graft.operators

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** BPE tokenizer training (byte-pair encoding, the subword vocabulary
  * induction behind every modern LM tokenizer) in the word-frequency
  * formulation of Sennrich et al. 2016: count distinct words ONCE,
  * then iterate merges over the bounded vocabulary table — never over
  * the corpus.
  *
  * Scale shape: the only corpus-sized pass is the word-count groupBy
  * (map-side combinable). Each merge iteration runs two small jobs over
  * the vocabulary (pair-count aggregate + argmax), and the single
  * winning pair per iteration is the ONE driver-side row this operator
  * collects — the canonical iterative-refinement pattern (same as
  * KMeans centroids), not a data collect. Lineage grows by one
  * `replace` per merge; at hundreds of merges insert a checkpoint
  * every ~20 iterations (noted, not needed at the demo merge count).
  *
  * Determinism / oracle contract: the spelling of a word is its
  * characters each wrapped in single spaces (`"abc"` → `" a  b  c "`),
  * so tokens are separated by DOUBLE spaces and applying merge (l, r)
  * is the plain string replacement `" l  r "` → `" lr "` — left-to-
  * right, non-overlapping, which reproduces greedy BPE exactly
  * (consecutive overlaps like `a a a a` merge to `aa aa`, because each
  * token carries its own boundary spaces). `replace` has identical
  * semantics in the JVM and DuckDB, so the oracle replays training
  * merge for merge. Argmax ties break by (count desc, left, right).
  */
object BpeTrainer {

  /** Learn `nMerges` merges; returns (merge_rank, lhs, rhs, pair_count)
    * in learning order. Stops early if the vocabulary runs out of
    * pairs. */
  def trainMerges(docs: DataFrame, textCol: String,
      nMerges: Int): DataFrame = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    val spark = docs.sparkSession
    val words = docs
      .select(explode(TF.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    // the ONE corpus pass materializes here — without the checkpoint
    // every iteration's argmax job would re-run the corpus-sized
    // tokenize+explode+groupBy (same policy as PageRank/CC)
    var sp = words.select(col("cnt"),
      regexp_replace(col("w"), "(.)", " $1 ").as("sp"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[Row]
    var i = 1
    var exhausted = false
    while (i <= nMerges && !exhausted) {
      val toks = split(trim(col("sp")), "  ")
      val best = sp
        .select(col("cnt"), col("sp"))
        .withColumn("t", toks)
        // single-symbol spellings have no pairs (and Spark's
        // sequence(1, 0) would DESCEND, not return empty)
        .filter(size(col("t")) >= 2)
        .select(col("cnt"), explode(transform(
          sequence(lit(1), size(col("t")) - 1),
          j => struct(element_at(col("t"), j).as("l"),
            element_at(col("t"), j + 1).as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("c"))
        .orderBy(col("c").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, c) = (best(0).getString(0), best(0).getString(1),
          best(0).getLong(2))
        merges += Row(i, l, r, c)
        sp = sp.withColumn("sp",
          org.apache.spark.sql.functions.replace(col("sp"),
            lit(s" $l  $r "), lit(s" $l$r ")))
        i += 1
      }
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(merges.toSeq, 1),
      StructType(Seq(
        StructField("merge_rank", IntegerType, nullable = false),
        StructField("lhs", StringType, nullable = false),
        StructField("rhs", StringType, nullable = false),
        StructField("pair_count", LongType, nullable = false))))
  }

  /** Segment `textCol` with an already-learned merge table (applied in
    * rank order): the corpus-side ENCODE step, a pure map stage — the
    * merge list compiles into a chain of `replace` expressions, no
    * join, no shuffle. Returns the input plus `bpe_tokens`
    * (space-joined subword string) and `n_bpe_tokens`. */
  def encode(docs: DataFrame, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    def perWord(w: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      val spelled = regexp_replace(w, "(.)", " $1 ")
      val applied = merges.foldLeft(spelled) { case (acc, (l, r)) =>
        org.apache.spark.sql.functions.replace(acc,
          lit(s" $l  $r "), lit(s" $l$r "))
      }
      trim(regexp_replace(applied, "  ", " "))
    }
    docs.withColumn("bpe_tokens",
      concat_ws(" ", transform(TF.tokens(col(textCol)), perWord(_))))
      .withColumn("n_bpe_tokens",
        // split("") yields [""], so the empty document must count 0
        when(col("bpe_tokens") === "", 0L)
          .otherwise(size(split(col("bpe_tokens"), " ")).cast("long")))
  }
}
