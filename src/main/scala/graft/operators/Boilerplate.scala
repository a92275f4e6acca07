package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-document boilerplate removal (the C4/RefinedWeb "drop lines
  * repeated across many pages" step, re-expressed for a corpus whose
  * unit of repetition is a token window rather than a newline): every
  * document is segmented into NON-overlapping `width`-token chunks, a
  * chunk seen in more than `minDocs` distinct documents is declared
  * boilerplate, and cleaning drops exactly those chunks from every
  * document.
  *
  * Non-overlapping segmentation (vs the overlapping shingles of
  * [[Dedup]]/[[Decontamination]]) is what makes removal well-defined:
  * each token belongs to exactly one segment, so "drop the segment"
  * never double-counts.
  *
  * Scale shape: segments explode map-side; the dictionary is one
  * count-distinct aggregate shuffled on the 16-byte segment
  * fingerprint; cleaning is a fingerprint equi-join back to the
  * exploded segments. The boilerplate dictionary (freq > minDocs) is
  * vastly smaller than the corpus at any scale — headers, footers,
  * licence blocks — and the join key is the md5, never the text. No
  * driver-side state.
  */
object Boilerplate {

  /** Non-overlapping `width`-token segments of `tokensCol` (an already
    * tokenized array column): (idx, seg_fp) rows, where seg_fp is the
    * md5 of the space-joined segment text. Token counts that don't
    * divide evenly leave a final short segment — kept (it's real text).
    * Array stages are materialized column-by-column (HOFs interpret
    * their lambdas; never nest work inside one). */
  def segments(df: DataFrame, idCol: String, tokensCol: String,
      width: Int): DataFrame = {
    require(width > 0, "width must be positive")
    df.select(col(idCol), col(tokensCol).as("_toks"))
      .filter(size(col("_toks")) > 0)
      .withColumn("_n_segs",
        expr(s"cast(ceil(size(_toks) / cast($width as double)) as int)"))
      .withColumn("idx", explode(sequence(lit(1), col("_n_segs"))))
      .withColumn("_seg", expr(
        s"array_join(slice(_toks, (idx - 1) * $width + 1, $width), ' ')"))
      .select(col(idCol), col("idx").cast("long").as("idx"),
        md5(col("_seg")).as("seg_fp"),
        expr(s"size(slice(_toks, (idx - 1) * $width + 1, $width))")
          .cast("long").as("seg_len"))
  }

  /** The boilerplate dictionary: segment fingerprints occurring in more
    * than `minDocs` DISTINCT documents, with their document frequency. */
  def commonSegments(segs: DataFrame, idCol: String,
      minDocs: Int): DataFrame =
    segs.groupBy("seg_fp")
      .agg(countDistinct(col(idCol)).as("doc_freq"))
      .filter(col("doc_freq") > minDocs)

  /** Per-document cleaning report: segments / boilerplate segments
    * dropped / tokens kept. The left join marks each segment against
    * the dictionary; documents made entirely of boilerplate survive
    * with kept_tokens = 0 (the caller decides to drop them — that's a
    * quality-filter policy, not a dedup mechanic). */
  def cleanStats(df: DataFrame, idCol: String, tokensCol: String,
      width: Int, minDocs: Int): DataFrame = {
    // the segment table feeds BOTH the dictionary aggregate and the
    // marking join — checkpoint it once so the tokenize+explode+md5
    // subtree executes once per action, not twice (the segment rows
    // are ~|tokens|/width, far cheaper to hold than to recompute;
    // same checkpoint-not-persist policy as Dedup.minhashPairsScored)
    val segs = segments(df, idCol, tokensCol, width).localCheckpoint(true)
    val dict = commonSegments(segs, idCol, minDocs)
    segs.join(dict.select(col("seg_fp"), lit(1L).as("_common")),
        Seq("seg_fp"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_segs"),
        sum(when(col("_common").isNotNull, 1L).otherwise(0L))
          .as("n_dropped"),
        sum(when(col("_common").isNull, col("seg_len")).otherwise(0L))
          .as("kept_tokens"))
  }
}
