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

  /** Frame sampling under the oracle gate (the audio lane's move
    * applied to the video shape): normalized text bytes stand in for
    * the payload (pure ASCII, byte = ascii(char)), every 2nd 256-byte
    * frame emitted with its modular polynomial checksum — the
    * sequential fold replays in SQL as a `list_reduce`, so chunking,
    * stride, AND content are all hash-checked per frame (the raw-text
    * `multimodal_frames` lane keeps its rows-only check: multi-byte
    * UTF-8 in the zh docs has no per-char SQL byte twin). */
  def multimodalFramesOracle: Q = (s, d) => {
    val blobs = Tables.documents(s, d)
      .select(col("doc_id"), lit("video").as("media_type"),
        graft.functions.TextFunctions.normalize(col("text"))
          .cast("binary").as("data"))
    Multimodal.sampleFrames(s, blobs, stride = 2).toDF()
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        col("frame_bytes").cast("long").as("frame_bytes"),
        col("frame_hash"))
  }

  /** Binary→binary resize (decimation stub) re-measured by the feature
    * extractor: original vs resized byte counts per doc. The resized
    * length is ceil(n/3) — a pure function of payload length, so DuckDB
    * oracles the chained binary ops end-to-end. */
  def multimodalResize: Q = (s, d) => {
    val blobs = Multimodal.attachBlobs(Tables.documents(s, d))
    val resized = Multimodal.resizeBlobs(s, blobs, factor = 3)
    Multimodal.extractFeatures(s, resized.toDF()).toDF()
      .select(col("doc_id"), col("n_bytes").as("resized_bytes"))
      .join(Multimodal.extractFeatures(s, blobs).toDF()
        .select(col("doc_id"), col("n_bytes").as("orig_bytes")), Seq("doc_id"))
      .select(col("doc_id"), col("orig_bytes"), col("resized_bytes"))
  }

  /** The multimodal→ANN bridge: blob → hash-derived 8-dim embedding
    * (mapPartitions encoder stub, oracle-replayable) → exact cosine
    * top-3 for the first three payloads. The whole
    * binary→embedding→similarity chain is hash-checked. */
  def multimodalEmbedAnn: Q = (s, d) => {
    val blobs = Multimodal.attachBlobs(Tables.documents(s, d))
    val emb = Multimodal.embedBlobs(s, blobs).toDF()
    graft.operators.SimilaritySearch.bruteForceTopK(
      emb, emb.filter(col("doc_id") < 3), "doc_id", "embedding", k = 3)
      .orderBy("probe_id", "rk")
  }

  /** Audio branch: normalized text bytes stand in for a PCM payload
    * (pure ASCII, so the stub decode sample = byte − 64 replays in
    * SQL); non-overlapping 64-sample windows with integer energy and
    * zero-crossing counts — the VAD front-end shape, fully
    * oracle-checked. */
  def multimodalAudio: Q = (s, d) => {
    val blobs = Tables.documents(s, d)
      .select(col("doc_id"), lit("audio").as("media_type"),
        graft.functions.TextFunctions.normalize(col("text"))
          .cast("binary").as("data"))
    Multimodal.audioFrames(s, blobs).toDF()
  }

  /** xxhash64 frame ids have no DuckDB twin; the portable
    * `multimodal_frames_oracle` twin replays the same sampler end to
    * end, and NoOracleLanesSpec pins this lane's values. Kept out of
    * the driver's oracle sweep. */
  val benchOnly: Map[String, Q] = Map(
    "multimodal_frames" -> multimodalFrames,
  )

  val queries: Map[String, Q] = Map(
    "multimodal_audio" -> multimodalAudio,
    "multimodal_features" -> multimodalFeatures,
    "multimodal_frames_oracle" -> multimodalFramesOracle,
    "multimodal_resize" -> multimodalResize,
    "multimodal_embed_ann" -> multimodalEmbedAnn,
  )

  val oracle: Map[String, String] = Map(
    // frame sampling replayed per frame: 256-char chunks of the ASCII
    // normalized text, stride 2, checksum = the same sequential
    // (acc*31 + byte) % 1e9+7 fold via list_reduce
    "multimodal_frames_oracle" ->
      """WITH c AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')) AS t
        | FROM documents),
        | f AS (SELECT doc_id, t,
        |   unnest(range(0, CAST(ceil(length(t) / 256.0) AS BIGINT))) AS i
        |  FROM c WHERE length(t) > 0)
        |SELECT doc_id, i AS frame_idx,
        | CAST(length(substring(t, CAST(i * 256 + 1 AS INT), 256))
        |   AS BIGINT) AS frame_bytes,
        | list_reduce(list_prepend(CAST(0 AS BIGINT),
        |   list_transform(
        |     split(substring(t, CAST(i * 256 + 1 AS INT), 256), ''),
        |     ch -> CAST(ascii(ch) AS BIGINT))),
        |   (a, b) -> (a * 31 + b) % 1000000007) AS frame_hash
        |FROM f WHERE i % 2 = 0""".stripMargin,
    // the audio stub decode + framing replayed sample for sample:
    // ascii(char) − 64 samples, (j−1)//64 windows, crossings counted
    // only between neighbors in the SAME window
    "multimodal_audio" ->
      """WITH c AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')) AS t
        | FROM documents),
        | idx AS (SELECT doc_id, t,
        |   unnest(generate_series(1, length(t))) AS j
        |  FROM c WHERE length(t) > 0),
        | smp AS (SELECT doc_id, j,
        |   ascii(substring(t, j, 1)) - 64 AS s FROM idx),
        | w AS (SELECT doc_id, j, s, (j - 1) // 64 AS win_idx,
        |   lead(s) OVER (PARTITION BY doc_id ORDER BY j) AS nxt
        |  FROM smp)
        |SELECT doc_id, CAST(win_idx AS BIGINT) AS win_idx,
        | CAST(count(*) AS BIGINT) AS n_samples,
        | CAST(sum(s * s) AS BIGINT) AS energy,
        | CAST(sum(CASE WHEN j // 64 = (j - 1) // 64
        |   AND nxt IS NOT NULL AND s * nxt < 0 THEN 1 ELSE 0 END)
        |   AS BIGINT) AS zero_crossings
        |FROM w GROUP BY 1, 2""".stripMargin,
    "multimodal_features" ->
      """SELECT doc_id,
        | CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        | CAST(octet_length(encode(text)) % 640 + 1 AS INT) AS width,
        | CAST(CAST(octet_length(encode(text)) AS BIGINT) * 7 % 480 + 1 AS INT) AS height,
        | CAST(greatest((octet_length(encode(text)) + 255) // 256, 1) AS INT) AS n_frames,
        | CAST(CAST(octet_length(encode(text)) AS BIGINT) * 2654435761 % 255 AS DOUBLE) AS luma
        |FROM documents""".stripMargin,
    "multimodal_resize" ->
      """SELECT doc_id,
        | CAST(octet_length(encode(text)) AS BIGINT) AS orig_bytes,
        | CAST((octet_length(encode(text)) + 2) // 3 AS BIGINT)
        |   AS resized_bytes
        |FROM documents""".stripMargin,
    // the encoder stub is pure hash arithmetic, replayed dimension by
    // dimension; float cast then double cosine mirrors the Spark path
    "multimodal_embed_ann" ->
      """WITH e AS (SELECT doc_id,
        |  list_transform(generate_series(0, 7), d ->
        |    CAST(CAST(CAST(concat('0x', substring(md5(concat(md5(text),
        |      CAST(d AS VARCHAR))), 1, 8)) AS BIGINT) AS DOUBLE)
        |      / 4294967296.0 * 2.0 - 1.0 AS FLOAT)) AS v
        | FROM documents)
        |SELECT probe_id, rk, cand_id, cos FROM (
        | SELECT p.doc_id AS probe_id, c.doc_id AS cand_id,
        |  round(list_cosine_similarity(CAST(p.v AS DOUBLE[]),
        |    CAST(c.v AS DOUBLE[])), 4) AS cos,
        |  CAST(row_number() OVER (PARTITION BY p.doc_id
        |    ORDER BY round(list_cosine_similarity(CAST(p.v AS DOUBLE[]),
        |      CAST(c.v AS DOUBLE[])), 4) DESC, c.doc_id ASC) AS BIGINT)
        |    AS rk
        | FROM e p JOIN e c ON c.doc_id <> p.doc_id
        | WHERE p.doc_id < 3)
        |WHERE rk <= 3 ORDER BY probe_id, rk""".stripMargin,
  )
}
