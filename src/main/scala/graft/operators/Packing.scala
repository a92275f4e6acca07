package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the step that turns a deduplicated, filtered
  * document corpus into fixed-token-budget training sequences.
  * Two standard layouts:
  *
  *  - [[chunkPack]]: concat-and-chunk. Documents are concatenated in a
  *    deterministic order and sliced every `budget` tokens; documents
  *    may straddle sequence boundaries (the classic GPT-style packing —
  *    zero padding waste). Pure window arithmetic, fully codegen'd.
  *  - [[nextFitPack]]: whole-document next-fit. A document never splits;
  *    a sequence closes as soon as the next document would overflow it.
  *    Non-associative running state (the fill resets on overflow), which
  *    no window function expresses — per-shard sorted `mapPartitions`
  *    is the honest shape (the one legitimate per-partition-imperative
  *    use in this codebase, mirroring how production packers work:
  *    each worker packs its own shard).
  *
  * Scale design: packing is embarrassingly parallel ACROSS shards and
  * inherently sequential WITHIN one, so the corpus is hash-sharded
  * first (`pmod(md5-hash(id, salt), shards)`) and all order/offset
  * arithmetic is per-shard. One shuffle on the shard key, then map-side
  * window/iterator work; no global sort, no driver state. The order
  * within a shard is the md5 of the id — deterministic, layout- and
  * retry-stable, engine-portable (the DuckDB oracle replays it), and
  * doubles as the training-order shuffle (documents land in hash order,
  * not corpus order).
  *
  * Reference scope note: the reference engine (nyc-taxi-data-clickhouse)
  * has no packing surface; this is part of the LLM-pipeline extension
  * family the build brief makes first-class.
  */
object Packing {

  /** md5-derived order key: deterministic, uniform, collision-free for
    * distinct ids (full 32-hex-char string). */
  private[graft] def orderKey(id: Column, salt: String): Column =
    md5(concat(id.cast("string"), lit(salt)))

  /** Shard from the first 8 hex chars of the same md5. */
  private[graft] def shardOf(ord: Column, shards: Int): Column =
    pmod(conv(substring(ord, 1, 8), 16, 10).cast("long"), lit(shards.toLong))

  /** Per-document sliding token windows (RAG-style overlapping
    * chunking): windows of `chunkSize` tokens starting every `stride`
    * tokens (stride < chunkSize ⇒ overlap), trailing windows shrink at
    * the document end. The third sequence-forming layout beside
    * [[chunkPack]] and [[nextFitPack]], for retrieval corpora where a
    * chunk must never span documents and context overlap is wanted.
    *
    * Map-only: every document emits its own chunks inside the scan
    * stage — no shuffle, no state, the shape that scales to any corpus
    * size. The tokens array is materialized before the (interpreted)
    * transform lambda, same discipline as the MinHash path. Output:
    * (doc_id, chunk_id, n_tokens, chunk_fp). */
  def slidingChunks(df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0, "chunkSize and stride positive")
    df.select(col(idCol).as("doc_id"),
      graft.functions.TextFunctions.tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) > 0)
      // posexplode the START POSITIONS; the chunk slice happens in the
      // codegen'd projection after (slicing inside the transform()
      // lambda is interpreted — the HOF cost the bigram/span paths
      // avoid the same way)
      .select(col("doc_id"), col("toks"), posexplode(
        sequence(lit(1), size(col("toks")), lit(stride))))
      .toDF("doc_id", "toks", "chunk_id", "s")
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        slice(col("toks"), col("s"), lit(chunkSize)).as("chunk"))
      .select(col("doc_id"), col("chunk_id"),
        size(col("chunk")).cast("long").as("n_tokens"),
        md5(concat_ws(" ", col("chunk")).cast("binary")).as("chunk_fp"))
  }

  /** Concat-and-chunk packing plan. Output: one row per document with
    * its shard, placement, and split count —
    * (id, shard, start_tok, first_seq, last_seq, start_off, n_splits).
    * `first_seq`/`last_seq` are the sequence indices (per shard, width
    * `budget`) holding the document's first/last token; `start_off` is
    * the offset of its first token inside `first_seq`; `n_splits` is
    * how many sequence boundaries cut through it. */
  def chunkPack(df: DataFrame, idCol: String, tokenCol: String,
      budget: Long, shards: Int, salt: String = "pack"): DataFrame = {
    require(budget > 0, "budget must be positive")
    val ord = orderKey(col(idCol), salt)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("_ord"), col(idCol))
    df.select(col(idCol), col(tokenCol).cast("long").as("_tok"),
        ord.as("_ord"))
      .withColumn("shard", shardOf(col("_ord"), shards))
      .withColumn("_cum", sum(col("_tok")).over(w))
      .withColumn("start_tok", col("_cum") - col("_tok"))
      // integer division throughout: `div`, never `/` (double division
      // loses exactness on large longs and drifts vs the oracle)
      .withColumn("first_seq", expr(s"start_tok div ${budget}L"))
      .withColumn("last_seq",
        when(col("_tok") > 0, expr(s"(_cum - 1L) div ${budget}L"))
          .otherwise(col("first_seq")))
      .withColumn("start_off", pmod(col("start_tok"), lit(budget)))
      .withColumn("n_splits", col("last_seq") - col("first_seq"))
      .select(col(idCol), col("shard"), col("start_tok"), col("first_seq"),
        col("last_seq"), col("start_off"), col("n_splits"))
  }

  /** Whole-document next-fit packing: documents in per-shard hash order;
    * a document joins the current sequence iff it fits, else opens the
    * next one (an oversized document occupies a sequence alone, closing
    * the previous). Output: (id, shard, seq_id) with seq_id counted per
    * shard from 0.
    *
    * Physical shape: one hash shuffle on shard + a per-partition sorted
    * scan (`repartition(shard)` guarantees shard co-location;
    * `sortWithinPartitions` orders within; the iterator resets state on
    * shard change — the classic secondary-sort pattern). */
  def nextFitPack(df: DataFrame, idCol: String, tokenCol: String,
      budget: Long, shards: Int, salt: String = "pack"): DataFrame = {
    require(budget > 0, "budget must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val ord = orderKey(col(idCol), salt)
    val prepared = df
      .select(col(idCol).cast("long").as("id"),
        col(tokenCol).cast("long").as("tok"), ord.as("ord"))
      .withColumn("shard", shardOf(col("ord"), shards))
      .select(col("shard"), col("ord"), col("id"), col("tok"))
      .as[(Long, String, Long, Long)]
    prepared
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("ord"), col("id"))
      .mapPartitions { it =>
        var curShard = Long.MinValue
        var seq = 0L
        var fill = 0L
        it.map { case (shard, _, id, tok) =>
          if (shard != curShard) { curShard = shard; seq = 0L; fill = 0L }
          if (fill > 0 && fill + tok > budget) { seq += 1; fill = 0L }
          fill += tok
          (id, shard, seq)
        }
      }
      .toDF("id", "shard", "seq_id")
  }

  /** Per-shard packing report for a [[nextFitPack]] result joined back
    * to token counts: sequences formed, docs, tokens, and fill rate —
    * what a dataset card reports about the packed corpus. */
  def packReport(packed: DataFrame, tokens: DataFrame, idCol: String,
      tokenCol: String, budget: Long): DataFrame =
    packed.join(tokens.select(col(idCol).as("id"),
        col(tokenCol).cast("long").as("_tok")), Seq("id"))
      .groupBy("shard")
      .agg(countDistinct(col("seq_id")).as("n_seqs"),
        count(lit(1)).as("n_docs"),
        sum(col("_tok")).as("n_tokens"))
      // whole-valued longs through one IEEE division: engine-exact
      .withColumn("fill_rate",
        col("n_tokens").cast("double") /
          (col("n_seqs") * lit(budget)).cast("double"))

  /** Length-bucketed batching — the PADDED-batch counterpart of the
    * packed-sequence builders above: a trainer that pads each batch to
    * its longest member wants batches of SIMILAR-length documents, and
    * random batching wastes (max−len) padding tokens per doc. Docs
    * land in a length bucket (binWidth-sized bins), are ordered
    * (length, id) within the bucket, and cut into batches of
    * `batchSize`; per batch the report carries the padding cost the
    * trainer will actually pay. One shuffle on the bucket key (the
    * window partition); batch ids are bucket-scoped so the layout is
    * deterministic and engine-replayable.
    *
    * Returns per-batch rows: (bucket, batch_id, n_docs, max_len,
    * sum_len, padding) with padding = n_docs·max_len − sum_len. */
  def lengthBucketBatches(docs: DataFrame, idCol: String,
      lenCol: Column, binWidth: Long, batchSize: Int): DataFrame = {
    require(binWidth > 0 && batchSize > 0)
    val w = Window.partitionBy(col("bucket"))
      .orderBy(col("len").asc, col("id").asc)
    docs.select(col(idCol).as("id"), lenCol.cast("long").as("len"))
      .withColumn("bucket", (col("len") / binWidth).cast("long"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("batch_id", ((col("rn") - 1) / batchSize).cast("long"))
      .groupBy(col("bucket"), col("batch_id"))
      .agg(count(lit(1)).as("n_docs"),
        max(col("len")).as("max_len"),
        sum(col("len")).as("sum_len"))
      .withColumn("padding",
        col("n_docs") * col("max_len") - col("sum_len"))
  }
}
