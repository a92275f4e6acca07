package graft.operators

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diffing — the data-versioning audit between two
  * pipeline runs: which documents were added, removed, or changed
  * (same id, different content), and the per-status counts a dataset
  * card reports per release.
  *
  * Scale shape: each side reduces to (id, content-fingerprint) — the
  * 16-byte md5 of normalized text, never the text itself — then one
  * full-outer equi-join on the id. Both sides stream at any size; the
  * join is the only shuffle. Comparing fingerprints instead of bodies
  * keeps the shuffle narrow no matter how large documents get.
  */
object SnapshotDiff {

  /** Per-document status: (id, status ∈ added|removed|changed|same).
    * `added` = only in `cur`; `removed` = only in `prev`; `changed` =
    * both, different normalized content. */
  def diff(prev: DataFrame, cur: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    def fps(df: DataFrame, side: String): DataFrame =
      df.select(col(idCol).as("id"),
        TF.fingerprint(col(textCol)).as(s"fp_$side"))
    fps(prev, "prev").join(fps(cur, "cur"), Seq("id"), "full_outer")
      .select(col("id"),
        when(col("fp_prev").isNull, lit("added"))
          .when(col("fp_cur").isNull, lit("removed"))
          .when(col("fp_prev") =!= col("fp_cur"), lit("changed"))
          .otherwise(lit("same")).as("status"))
  }

  /** Release summary: counts per status. */
  def summary(prev: DataFrame, cur: DataFrame, idCol: String,
      textCol: String): DataFrame =
    diff(prev, cur, idCol, textCol)
      .groupBy("status").agg(count(lit(1)).as("n_docs"))
}
