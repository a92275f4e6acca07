package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads travel as
  * opaque `binary` columns with typed metadata, and decode /
  * feature-extract / frame-sample run as imperative per-partition batch
  * transforms (`mapPartitions` on typed Datasets — the Scala analogue of
  * arrow-batched Python UDFs).
  *
  * The Spark-side plumbing is real: schemas, encoders, partition-batch
  * iteration, and the binary column shape are exactly what a production
  * pipeline uses at 100 TB (payloads never hit the driver; decode
  * parallelism = partition count; feature rows are columnar downstream).
  * The codec itself is a clearly-marked deterministic STUB because this
  * environment ships no image/audio libraries — `decodeImage` derives
  * "pixel" stats from byte length and content arithmetic instead of a
  * real decode, keeping every downstream contract testable.
  */
object Multimodal {

  /** A blob row: payload + minimal typed metadata. */
  case class MediaBlob(doc_id: Long, media_type: String, data: Array[Byte])

  /** Extracted per-media features (fake decode, real schema). */
  case class MediaFeatures(doc_id: Long, n_bytes: Long, width: Int,
      height: Int, n_frames: Int, luma: Double)

  /** A sampled "frame": fixed-size byte chunk + its modular checksum. */
  case class Frame(doc_id: Long, frame_idx: Int, frame_bytes: Int,
      frame_hash: Long)

  val FrameSize = 256

  /** Attach a binary payload column (UTF-8 text bytes stand in for real
    * media payloads) with typed metadata. */
  def attachBlobs(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      lit("image").as("media_type"),
      col("text").cast("binary").as("data"))

  /** STUB decode — deterministic fake of (width, height, luma); a real
    * deployment swaps in an actual codec here and nothing else changes. */
  def decodeImage(bytes: Array[Byte]): (Int, Int, Double) = {
    val n = bytes.length.toLong
    val width = (n % 640 + 1).toInt
    val height = (n * 7 % 480 + 1).toInt
    val luma = (n * 2654435761L % 255L).toDouble
    (width, height, luma)
  }

  /** Per-partition batch feature extraction over blob rows. */
  def extractFeatures(spark: SparkSession, blobs: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    blobs.select("doc_id", "media_type", "data").as[MediaBlob]
      .mapPartitions { it =>
        it.map { b =>
          val (w, h, luma) = decodeImage(b.data)
          val nFrames = ((b.data.length + FrameSize - 1) / FrameSize).max(1)
          MediaFeatures(b.doc_id, b.data.length.toLong, w, h, nFrames, luma)
        }
      }
  }

  /** Binary→binary transform (the resize/thumbnail shape): payloads are
    * decimated by `factor` (every factor-th byte — the STUB standing in
    * for a real resampling kernel; a codec swap changes only the inner
    * function). Output rows keep the blob schema, so resize chains with
    * [[extractFeatures]]/[[sampleFrames]] like any media op. At scale
    * this is map-only: no shuffle, payloads never leave their
    * partition. */
  def resizeBlobs(spark: SparkSession, blobs: DataFrame,
      factor: Int): Dataset[MediaBlob] = {
    import spark.implicits._
    require(factor >= 1, "factor must be >= 1")
    blobs.select("doc_id", "media_type", "data").as[MediaBlob]
      .mapPartitions { it =>
        it.map { b =>
          val out = b.data.zipWithIndex.collect {
            case (byte, i) if i % factor == 0 => byte
          }
          MediaBlob(b.doc_id, s"${b.media_type}/resized", out)
        }
      }
  }

  /** A media embedding row: the output contract of any real encoder. */
  case class MediaEmbedding(doc_id: Long, embedding: Array[Float])

  /** Media → embedding extraction (the CLIP/encoder shape): payloads
    * batch through mapPartitions and come out as fixed-width float
    * vectors feeding the similarity-search operators — the bridge from
    * the multimodal family into the ANN family. The "encoder" is a
    * deterministic STUB (md5-derived unit-range floats — no model
    * weights ship in this environment), but unlike a random stub it is
    * REPLAYABLE BY THE ORACLE: every dimension is pure hash arithmetic
    * both engines compute identically, so the whole
    * blob→embedding→top-k chain is hash-checked end to end. */
  def embedBlobs(spark: SparkSession, blobs: DataFrame,
      dims: Int = 8): Dataset[MediaEmbedding] = {
    import spark.implicits._
    blobs.select("doc_id", "media_type", "data").as[MediaBlob]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        def hex(bytes: Array[Byte]): String = {
          md.reset()
          md.digest(bytes).map(b => f"${b & 0xFF}%02x").mkString
        }
        it.map { b =>
          val payloadHex = hex(b.data)
          val emb = Array.tabulate(dims) { d =>
            val h = java.lang.Long.parseLong(
              hex((payloadHex + d.toString).getBytes("UTF-8"))
                .substring(0, 8), 16)
            (h.toDouble / 4294967296.0 * 2.0 - 1.0).toFloat
          }
          MediaEmbedding(b.doc_id, emb)
        }
      }
  }

  /** A framed audio-analysis row: per fixed-size sample window. */
  case class AudioFrame(doc_id: Long, win_idx: Long, n_samples: Long,
      energy: Long, zero_crossings: Long)

  val AudioWindow = 64

  /** Audio branch of the multimodal family: payload bytes decode to a
    * PCM-like waveform (STUB decode: sample = byte − 64 — ASCII
    * payloads give signed, sign-alternating samples), framed into
    * non-overlapping [[AudioWindow]]-sample windows with per-window
    * energy (Σ s²) and zero-crossing counts — the standard VAD/silence
    * feature front-end. All-integer feature math, so unlike a real
    * codec the stub is REPLAYED BY THE ORACLE sample for sample.
    * Same partition-batch shape as every media op: one input row fans
    * out to its windows, payloads never leave the partition. */
  def audioFrames(spark: SparkSession, blobs: DataFrame): Dataset[AudioFrame] = {
    import spark.implicits._
    blobs.select("doc_id", "media_type", "data").as[MediaBlob]
      .mapPartitions { it =>
        it.flatMap { b =>
          val s = b.data.map(byte => (byte & 0xFF) - 64)
          val n = s.length
          (0 until n by AudioWindow).iterator.map { start =>
            val end = math.min(start + AudioWindow, n)
            var energy = 0L
            var zc = 0L
            var k = start
            while (k < end) {
              energy += s(k).toLong * s(k)
              if (k + 1 < end && s(k).toLong * s(k + 1) < 0) zc += 1
              k += 1
            }
            AudioFrame(b.doc_id, (start / AudioWindow).toLong,
              (end - start).toLong, energy, zc)
          }
        }
      }
  }

  /** Sample every `stride`-th fixed-size chunk ("frame") of each payload
    * — the video-frame-sampling shape: one input row fans out to few
    * output rows, still fully partition-parallel. */
  def sampleFrames(spark: SparkSession, blobs: DataFrame,
      stride: Int): Dataset[Frame] = {
    import spark.implicits._
    blobs.select("doc_id", "media_type", "data").as[MediaBlob]
      .mapPartitions { it =>
        it.flatMap { b =>
          b.data.grouped(FrameSize).zipWithIndex.collect {
            case (chunk, i) if i % stride == 0 =>
              val h = chunk.foldLeft(0L)((acc, byte) =>
                (acc * 31 + (byte & 0xFF)) % 1000000007L)
              Frame(b.doc_id, i, chunk.length, h)
          }
        }
      }
  }
}
