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
  * the vocabulary (pair-count aggregate + argmax), and the winning
  * pairs per iteration are the ONLY driver-side rows this operator
  * collects — the canonical iterative-refinement pattern (same as
  * KMeans centroids), not a data collect.
  *
  * Driver-loop bound: sequential training runs ONE pair-count job per
  * merge — fine at demo merge counts, unbounded at vocab scale (30 k
  * merges = 30 k jobs). `batchSize > 1` amortizes that: each job's
  * ranked pair table admits the longest RANK-PREFIX of pairwise
  * symbol-disjoint pairs (stop at the first pair sharing a symbol
  * with an accepted one — never skip past it). Disjoint pairs'
  * counts are invariant under each other's replacements, and any pair
  * a batch merge CREATES is bounded by an ancestor pair that would
  * have ended the prefix first, so batched training reproduces
  * sequential training exactly (up to count-ties involving created
  * symbols — exotic; lower `batchSize` if a corpus manufactures one).
  * Job count drops from nMerges to ~nMerges/acceptedPerBatch. Lineage
  * is re-checkpointed every ~20 applied merges (pin + release of the
  * previous blocks, the [[graft.util.Checkpoints]] policy).
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
    * pairs. `batchSize` merges may be accepted per pair-count job (see
    * object doc for the disjoint-prefix rule that keeps batched ≡
    * sequential); 1 = classic sequential training. */
  def trainMerges(docs: DataFrame, textCol: String,
      nMerges: Int, batchSize: Int = 1): DataFrame = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    val spark = docs.sparkSession
    val words = docs
      .select(explode(TF.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    // the ONE corpus pass materializes here — without the checkpoint
    // every iteration's argmax job would re-run the corpus-sized
    // tokenize+explode+groupBy (same policy as PageRank/CC)
    var (sp, release) = graft.util.Checkpoints.pin(
      words.select(col("cnt"),
        regexp_replace(col("w"), "(.)", " $1 ").as("sp")))
    val merges = scala.collection.mutable.ArrayBuffer.empty[Row]
    var sinceCheckpoint = 0
    var i = 1
    var exhausted = false
    while (i <= nMerges && !exhausted) {
      val toks = split(trim(col("sp")), "  ")
      val want = math.min(batchSize, nMerges - i + 1)
      val ranked = sp
        .select(col("cnt"), col("sp"))
        .withColumn("t", toks)
        // single-symbol spellings have no pairs (and Spark's
        // sequence(1, 0) would DESCEND, not return empty)
        .filter(size(col("t")) >= 2)
        // explode positions, extract the pair in the codegen'd
        // projection (transform() lambdas are interpreted — the
        // bigram-path discipline)
        .select(col("cnt"), col("t"),
          explode(sequence(lit(1), size(col("t")) - 1)).as("j"))
        .groupBy(element_at(col("t"), col("j")).as("l"),
          element_at(col("t"), col("j") + 1).as("r"))
        .agg(sum(col("cnt")).as("c"))
        .orderBy(col("c").desc, col("l").asc, col("r").asc)
        .limit(want).collect()
      if (ranked.isEmpty) exhausted = true
      else {
        // longest rank-prefix of pairwise symbol-disjoint pairs: stop
        // at (never skip) the first conflict — skipping would let a
        // pair whose count the earlier merges change into the batch
        val symbols = scala.collection.mutable.Set.empty[String]
        val accepted = ranked.iterator.takeWhile { row =>
          val (l, r) = (row.getString(0), row.getString(1))
          // the batch's FIRST pair is the sequential argmax — always
          // taken (even a self-pair like (a,a)); later pairs must be
          // symbol-disjoint from every accepted one
          val ok = symbols.isEmpty || (!symbols(l) && !symbols(r))
          if (ok) { symbols += l; symbols += r }
          ok
        }.toSeq
        accepted.foreach { row =>
          val (l, r, c) =
            (row.getString(0), row.getString(1), row.getLong(2))
          merges += Row(i, l, r, c)
          sp = sp.withColumn("sp",
            org.apache.spark.sql.functions.replace(col("sp"),
              lit(s" $l  $r "), lit(s" $l$r ")))
          i += 1
        }
        sinceCheckpoint += accepted.size
        if (sinceCheckpoint >= 20) {
          // cut the replace-chain lineage and drop the stale blocks
          val (cp, rel) = graft.util.Checkpoints.pin(sp)
          release(); sp = cp; release = rel
          sinceCheckpoint = 0
        }
      }
    }
    release()
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
