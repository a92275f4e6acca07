package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Content-defined chunking: exact tiling, short-doc degenerate case,
  * and the property CDC exists for — boundaries re-synchronize after
  * an edit, so most chunk fingerprints survive a prefix insertion. */
class ContentChunkerSpec extends SparkSpec {

  import spark.implicits._

  private def chunksOf(rows: Seq[(Long, String)]) =
    ContentChunker.chunks(rows.toDF("doc_id", "text"), "doc_id", "text",
      window = 8, divisor = 64L)

  test("chunks tile the document exactly, in order") {
    val text = (1 to 400).map(i => ('a' + i % 26).toChar).mkString
    val got = chunksOf(Seq((1L, text)))
      .orderBy("chunk_idx").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.head._2 === 1L)
    assert(got.map(_._3).sum === text.length.toLong)
    // each chunk starts where the previous ended
    got.sliding(2).foreach {
      case Array((_, s1, l1), (_, s2, _)) => assert(s2 === s1 + l1)
      case _ =>
    }
    assert(got.map(_._1).toSeq === (1L to got.length).toSeq)
  }

  test("short documents form one whole-document chunk") {
    val got = chunksOf(Seq((1L, "abc"))).collect()
    assert(got.length === 1)
    assert((got.head.getLong(2), got.head.getLong(3)) === ((1L, 3L)))
  }

  test("imperative boundary pass ≡ explode-of-positions reference") {
    val dd = graft.Tables.documents(spark, sf())
      .withColumn("norm_text",
        graft.functions.TextFunctions.normalize(col("text")))
    val cols = Seq("doc_id", "chunk_idx", "start", "len", "chunk_fp")
    val fast = ContentChunker.chunks(dd, "doc_id", "norm_text", 8, 64L)
      .orderBy(cols.map(col): _*).collect().toSeq
    val ref = ContentChunker
      .chunksViaExplode(dd, "doc_id", "norm_text", 8, 64L)
      .orderBy(cols.map(col): _*).collect().toSeq
    assert(fast.nonEmpty)
    assert(fast === ref)
  }

  test("boundaries re-sync after a prefix edit (the CDC property)") {
    // Normalized text, per the operator's ASCII contract (the
    // production lane chunks norm_text; raw multi-byte text has no
    // byte↔char position agreement to chunk against).
    val base = graft.Tables.documents(spark, sf())
      .withColumn("norm_text",
        graft.functions.TextFunctions.normalize(col("text")))
      .orderBy(desc("n_chars")).select("norm_text").head().getString(0)
    val fps = (doc: String, id: Long) =>
      chunksOf(Seq((id, doc))).select("chunk_fp").collect()
        .map(_.getString(0)).toSet
    val orig = fps(base, 1L)
    val shifted = fps("inserted prefix text " + base, 3L)
    // after the insertion the hash windows re-align at the next
    // boundary: the bulk of the original chunks must survive
    val shared = (orig intersect shifted).size
    assert(orig.size >= 5, s"need a real multi-chunk doc, got ${orig.size}")
    assert(shared >= orig.size / 2,
      s"only $shared of ${orig.size} chunks survived the prefix edit")
  }

  test("dedup report totals reconcile") {
    val dd = graft.Tables.documents(spark, sf())
      .withColumn("norm_text",
        graft.functions.TextFunctions.normalize(col("text")))
    val r = ContentChunker.dedupReport(dd, "doc_id", "norm_text", 8, 64L)
      .collect().head
    val (distinct, total, shared) =
      (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(distinct <= total && shared <= total && distinct > 0)
  }
}
