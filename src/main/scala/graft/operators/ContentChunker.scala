package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Content-defined chunking (CDC): split documents at positions where a
  * rolling hash of the trailing `W`-char window hits a boundary
  * condition (`hash mod divisor == 0`) — the chunking scheme whose cut
  * points move WITH the content, so an insertion early in a document
  * shifts chunk boundaries only locally and duplicate detection over
  * chunks survives edits (the property fixed-width chunking lacks;
  * the storage-dedup / long-document-chunking standard).
  *
  * Determinism / oracle contract: the window hash is the fixed-width
  * polynomial Σ c_i · B^(W−1−i) mod M with per-term modular reduction
  * (products stay ≤ 127·M, no overflow), so the 8-term expression is
  * plain integer arithmetic both engines compute identically — every
  * boundary, chunk span, and chunk fingerprint replays in DuckDB.
  *
  * Scale shape: ONE imperative rolling-hash byte pass per document
  * ([[graft.functions.CdcChunkExplode]], a custom Generator — 3
  * modular ops per character) computes boundaries AND slices each
  * chunk as it closes, so a chunk row carries only its own
  * ~divisor-byte slice (not the whole document text) and nothing
  * re-scans the string per chunk. The whole operator is map-side —
  * no window shuffle, no join, no exchange; fingerprints are md5
  * over the emitted slices.
  */
object ContentChunker {

  val B = 257L
  val M = 1000000007L

  /** (doc_id, chunk_idx, start, len, chunk_fp) — 1-based char spans of
    * `textCol`, md5 fingerprints. Docs shorter than `window` form one
    * chunk. A boundary fires where the window hash ending at position
    * p satisfies hash mod divisor == 0; the final position is always a
    * boundary so chunks tile the document exactly.
    *
    * Contract: `textCol` is NORMALIZED text ([a-z0-9 ] — single-byte
    * ASCII), so the boundary pass's byte offsets equal `substring`'s
    * character offsets and the oracle's `ascii()` replay exactly (the
    * same contract as [[graft.functions.RollingHash]]). */
  def chunks(docs: DataFrame, idCol: String, textCol: String,
      window: Int, divisor: Long): DataFrame = {
    require(window >= 2 && window <= 16, s"window must be in [2,16]: $window")
    require(divisor >= 2, s"divisor must be >= 2, got $divisor")
    docs
      .select(col(idCol).as("doc_id"), col(textCol).as("t"))
      .select(col("doc_id"), graft.functions.CdcFunctions
        .cdcChunkExplode(col("t"), window, divisor))
      .select(col("doc_id"), col("chunk_idx"), col("start"), col("len"),
        md5(col("chunk").cast("binary")).as("chunk_fp"))
  }

  /** The explode-of-positions reference form of [[chunks]] — the shape
    * built purely from built-ins (per-position 8-term window hash in
    * the scan projection, lag-window span construction). Kept as the
    * parity target for [[chunks]]'s imperative rolling-hash pass; the
    * production path is `chunks`. */
  private[graft] def chunksViaExplode(docs: DataFrame, idCol: String,
      textCol: String, window: Int, divisor: Long): DataFrame = {
    require(window >= 2 && window <= 16, s"window must be in [2,16]: $window")
    require(divisor >= 2, s"divisor must be >= 2, got $divisor")
    val powers = Array.iterate(1L, window)(p => p * B % M).reverse
    val d = docs.select(col(idCol).as("doc_id"), col(textCol).as("t"),
      length(col(textCol)).as("n")).filter(col("n") > 0)
    // Hash on a pre-split char ARRAY, not substring(t, p, 1):
    // UTF8String substring scans from the string start to find the
    // character offset (variable-width UTF-8), so per-position
    // substrings are O(p) each — O(n²) per document. One split gives
    // O(1) element_at per term. The array rides the explode as a
    // reference inside whole-stage codegen; it is dropped before the
    // one shuffle.
    val hashAt = (p: org.apache.spark.sql.Column) =>
      powers.indices.map { i =>
        ascii(element_at(col("_chars"),
          (p - lit(window) + lit(1 + i)).cast("int"))) *
          lit(powers(i)) % M
      }.reduce(_ + _) % M
    val bounds = d
      .withColumn("_chars", split(col("t"), ""))
      .select(col("doc_id"), col("t"), col("n"), col("_chars"),
        explode(when(col("n") >= window,
          sequence(lit(window), col("n").cast("int")))
          .otherwise(array(col("n").cast("int")))).as("p"))
      .filter(col("n") < window || col("p") === col("n") ||
        hashAt(col("p")) % divisor === 0)
      .select(col("doc_id"), col("t"), col("p").cast("long").as("end"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("end").asc)
    bounds
      .withColumn("prev", coalesce(lag(col("end"), 1).over(w), lit(0L)))
      .withColumn("chunk_idx", row_number().over(w).cast("long"))
      .select(col("doc_id"), col("chunk_idx"),
        (col("prev") + 1L).as("start"),
        (col("end") - col("prev")).as("len"),
        md5(substring(col("t"), (col("prev") + 1L).cast("int"),
          (col("end") - col("prev")).cast("int")).cast("binary"))
          .as("chunk_fp"))
  }

  /** CDC dedup report: chunk the corpus, then count distinct vs total
    * chunks per fingerprint-equivalence — shared chunks across docs are
    * the savings CDC exists to expose. */
  def dedupReport(docs: DataFrame, idCol: String, textCol: String,
      window: Int, divisor: Long): DataFrame =
    chunks(docs, idCol, textCol, window, divisor)
      .groupBy("chunk_fp")
      .agg(count(lit(1)).as("n_occ"),
        countDistinct(col("doc_id")).as("n_docs"),
        min(col("len")).as("len"))
      .agg(count(lit(1)).as("distinct_chunks"),
        sum(col("n_occ")).as("total_chunks"),
        sum(when(col("n_docs") >= 2, col("n_occ")).otherwise(0L))
          .as("shared_occurrences"))
}
