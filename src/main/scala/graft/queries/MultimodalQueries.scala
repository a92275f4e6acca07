package graft.queries

import graft.Tables
import graft.multimodal.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal plumbing exposed through the driver contract. The decode
  * is a deterministic stub (see [[Multimodal]]), so its outputs are pure
  * functions of payload length/content and DuckDB can oracle them.
  */
object MultimodalQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Blob → mapPartitions feature extraction; length-derived fake
    * features are fully oracle-checkable. */
  def multimodalFeatures: Q = (s, d) => {
    val blobs = Multimodal.attachBlobs(Tables.documents(s, d))
    Multimodal.extractFeatures(s, blobs).toDF()
  }

  /** Frame sampling (every 2nd 256-byte chunk) summarized per doc:
    * checksum folds the sampled bytes, so this pins the chunking AND the
    * content path end-to-end. */
  def multimodalFrames: Q = (s, d) => {
    val blobs = Multimodal.attachBlobs(Tables.documents(s, d))
    Multimodal.sampleFrames(s, blobs, stride = 2).toDF()
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_sampled"),
        sum(col("frame_bytes")).as("sampled_bytes"),
        sum(col("frame_hash")).as("hash_sum"))
  }

  val queries: Map[String, Q] = Map(
    "multimodal_features" -> multimodalFeatures,
    "multimodal_frames" -> multimodalFrames,
  )

  val oracle: Map[String, String] = Map(
    "multimodal_features" ->
      """SELECT doc_id,
        | CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        | CAST(octet_length(encode(text)) % 640 + 1 AS INT) AS width,
        | CAST(CAST(octet_length(encode(text)) AS BIGINT) * 7 % 480 + 1 AS INT) AS height,
        | CAST(greatest((octet_length(encode(text)) + 255) // 256, 1) AS INT) AS n_frames,
        | CAST(CAST(octet_length(encode(text)) AS BIGINT) * 2654435761 % 255 AS DOUBLE) AS luma
        |FROM documents""".stripMargin,
  )
}
