package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private lazy val docs = {
    import spark.implicits._
    Seq((1L, "x" * 600), (2L, "short")).toDF("doc_id", "text")
  }

  test("attachBlobs produces binary payloads with metadata") {
    val b = Multimodal.attachBlobs(docs)
    assert(b.schema("data").dataType.typeName === "binary")
    val r = b.filter(col("doc_id") === 1).head()
    assert(r.getAs[Array[Byte]]("data").length === 600)
  }

  test("extractFeatures: deterministic stub decode over partitions") {
    val f = Multimodal.extractFeatures(spark, Multimodal.attachBlobs(docs))
      .collect().map(m => m.doc_id -> m).toMap
    assert(f(1L).n_bytes === 600L)
    assert(f(1L).width === (600 % 640 + 1))
    assert(f(1L).height === (600 * 7 % 480 + 1).toInt)
    assert(f(1L).n_frames === 3) // ceil(600/256)
    assert(f(2L).n_frames === 1)
    assert(f(1L).luma === (600L * 2654435761L % 255L).toDouble)
  }

  test("embedBlobs: deterministic unit-range vectors, layout-invariant") {
    val b = Multimodal.attachBlobs(docs)
    val e1 = Multimodal.embedBlobs(spark, b).collect()
      .map(m => m.doc_id -> m.embedding.toSeq).toMap
    assert(e1.keySet === Set(1L, 2L))
    e1.values.foreach { v =>
      assert(v.size === 8)
      v.foreach(x => assert(x >= -1.0f && x < 1.0f))
    }
    // same payload -> same embedding regardless of partitioning
    val e2 = Multimodal.embedBlobs(spark, b.repartition(5)).collect()
      .map(m => m.doc_id -> m.embedding.toSeq).toMap
    assert(e1 === e2)
    // distinct payloads -> distinct embeddings
    assert(e1(1L) !== e1(2L))
  }

  test("resizeBlobs decimates payload bytes and keeps the blob schema") {
    val resized = Multimodal.resizeBlobs(spark,
      Multimodal.attachBlobs(docs), factor = 3)
    val r = resized.filter(col("doc_id") === 2).head()
    // "short" → bytes at indexes 0 and 3: 's', 'r'
    assert(new String(r.data, "UTF-8") === "sr")
    assert(r.media_type === "image/resized")
    // resized blobs chain into the extractor unchanged
    val f = Multimodal.extractFeatures(spark, resized.toDF())
      .filter(col("doc_id") === 1).head()
    assert(f.n_bytes === 200) // ceil(600/3)
  }

  test("audioFrames: hand-computed window energy and zero crossings") {
    import spark.implicits._
    // samples = byte - 64: 'a'(97)->33, ' '(32)->-32, '0'(48)->-16
    // payload "a 0a" -> samples [33, -32, -16, 33]: one 4-sample window
    // energy = 1089+1024+256+1089 = 3458; crossings: 33/-32 and -16/33
    val blobs = Seq((1L, "audio", "a 0a".getBytes("UTF-8")))
      .toDF("doc_id", "media_type", "data")
    val got = Multimodal.audioFrames(spark, blobs).collect()
    assert(got.length === 1)
    assert(got.head === Multimodal.AudioFrame(1L, 0L, 4L, 3458L, 2L))
    // 70 samples -> windows of 64 + 6; crossing at the 64/65 boundary
    // must NOT count (different windows)
    val alt = ("a " * 35).trim + " " // 70 chars alternating sign
    val blobs2 = Seq((2L, "audio", alt.getBytes("UTF-8")))
      .toDF("doc_id", "media_type", "data")
    val g2 = Multimodal.audioFrames(spark, blobs2).collect()
      .map(f => f.win_idx -> (f.n_samples, f.zero_crossings)).toMap
    assert(g2(0L)._1 === 64L && g2(1L)._1 === 6L)
    // within window 0: 63 sign alternations; boundary 64->65 excluded
    assert(g2(0L)._2 === 63L && g2(1L)._2 === 5L)
  }

  test("sampleFrames strides chunks and checksums content") {
    val fr = Multimodal.sampleFrames(spark, Multimodal.attachBlobs(docs), 2)
      .collect()
    val d1 = fr.filter(_.doc_id == 1L).sortBy(_.frame_idx)
    assert(d1.map(_.frame_idx).toSeq === Seq(0, 2)) // frames 0,1,2 → stride 2
    assert(d1.head.frame_bytes === 256)
    assert(d1.last.frame_bytes === 600 - 512)
    // checksum of 256 'x' bytes, reference fold
    val expect = (1 to 256).foldLeft(0L)((a, _) => (a * 31 + 'x'.toInt) % 1000000007L)
    assert(d1.head.frame_hash === expect)
  }

  test("frames-oracle lane: ASCII payload, per-frame hash replay") {
    import spark.implicits._
    // normalize() collapses to lowercase ascii, so byte == ascii(char)
    // and the driver's SQL list_reduce replay sees the same samples
    val mixed = Seq((1L, "AB!  cd" + "e" * 300), (2L, "")).toDF("doc_id", "text")
    val blobs = mixed.select(col("doc_id"), lit("video").as("media_type"),
      graft.functions.TextFunctions.normalize(col("text"))
        .cast("binary").as("data"))
    val fr = Multimodal.sampleFrames(spark, blobs, 2).collect()
    // doc 2 normalizes empty → no frames at all
    assert(!fr.exists(_.doc_id == 2L))
    val d1 = fr.filter(_.doc_id == 1L).sortBy(_.frame_idx)
    // "ab cd" + 300×e = 305 chars → frames 0 (256) and 1 (49); stride 2
    // keeps only frame 0
    assert(d1.map(_.frame_idx).toSeq === Seq(0))
    assert(d1.head.frame_bytes === 256)
    val payload = "ab cd" + "e" * 300
    val expect = payload.take(256).foldLeft(0L)((a, c) =>
      (a * 31 + c.toInt) % 1000000007L)
    assert(d1.head.frame_hash === expect)
  }
}
