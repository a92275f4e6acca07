package graft.operators

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inverted-index construction: token → (document frequency, posting
  * list) — the retrieval-side structure behind BM25 serving, keyword
  * routing, and corpus exploration UIs. The batch build is the
  * map-reduce textbook case and stays fully declarative here.
  *
  * Scale shape: per-document token DEDUP happens map-side
  * (`array_distinct` on the token array before the explode), so a
  * 10k-occurrence stopword in one doc ships exactly one row into the
  * shuffle; the single shuffle groups by token. Posting lists are
  * CAPPED via the custom bounded top-k aggregate
  * ([[graft.functions.BoundedTopKAgg]]) — `collect_set` + `slice`
  * would buffer a head token's ENTIRE posting set (corpus-sized state
  * on one key) before capping; the bounded aggregate keeps O(k) state
  * through partial aggregation and merge, and df stays exact from the
  * same single pass. Callers wanting full postings partition the index
  * by token range instead (`partitionBy` on the writer).
  */
object InvertedIndex {

  /** One row per qualifying token: exact document frequency and the
    * first `sampleK` doc ids (ascending) as a comma-joined string —
    * deterministic, bounded, engine-comparable. Tokens below `minDf`
    * distinct documents are cut (the tail that bloats an index without
    * serving value). */
  def postings(docs: DataFrame, idCol: String, textCol: String,
      minDf: Long, sampleK: Int): DataFrame = {
    require(sampleK >= 1, s"sampleK must be >= 1, got $sampleK")
    docs
      .select(col(idCol).as("doc_id"),
        explode(array_distinct(TF.tokens(col(textCol)))).as("t"))
      .groupBy("t")
      .agg(graft.functions.BoundedTopKAgg
        .boundedTopK(col("doc_id"), sampleK).as("tk"))
      .select(col("t"), col("tk.cnt").as("df"),
        concat_ws(",",
          transform(col("tk.ids"), x => x.cast("string")))
          .as("postings_head"))
      .filter(col("df") >= minDf)
  }
}
