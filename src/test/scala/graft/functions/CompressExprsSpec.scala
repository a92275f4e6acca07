package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CompressExprsSpec extends SparkSpec {
  import CompressFunctions._

  /** Independent replay: deflate the same bytes directly. */
  private def directLen(s: String): Int = {
    val d = new java.util.zip.Deflater(6, true)
    val bytes = s.getBytes("UTF-8")
    d.setInput(bytes); d.finish()
    val buf = new Array[Byte](8192)
    var total = 0
    while (!d.finished()) total += d.deflate(buf)
    d.end()
    total
  }

  test("deflate_len matches a direct Deflater replay, eval and codegen") {
    import spark.implicits._
    val inputs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "ab" * 500,
      "x",
      "",
      "padding-1234 padding-1234 padding-1234 natural text mixed in",
      (0 until 400).map(i => ((i * 2654435761L) % 93 + 33).toChar)
        .mkString)
    val out = inputs.toDF("t")
      .select(col("t"), deflateLen(col("t")).as("dl"))
      .collect()
    out.filter(_.getString(0).nonEmpty).foreach { r =>
      assert(r.getInt(1) === directLen(r.getString(0)),
        s"mismatch for '${r.getString(0).take(30)}...'")
    }
    // empty string is 0 by convention (zlib would emit a 2-byte
    // empty final block; 0 keeps ratio handling trivial)
    assert(out.find(_.getString(0).isEmpty).get.getInt(1) === 0)
  }

  test("compression ratio orders repetitive < prose < random") {
    import spark.implicits._
    val rep = "spam spam spam " * 100
    val prose = ("Compression based quality signals catch template " +
      "floods that local ngram statistics miss because the LZ " +
      "window spans the whole document. ") * 10
    // java.util.Random's algorithm is specified (LCG, JLS) — the same
    // seed yields the same chars on every JVM; genuinely aperiodic
    val rng = new java.util.Random(42)
    val rand = (0 until 1500).map(_ => (rng.nextInt(94) + 33).toChar)
      .mkString
    val rows = Seq(("rep", rep), ("prose", prose), ("rand", rand))
      .toDF("k", "t")
      .select(col("k"), compressRatio(col("t")).as("r"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rows("rep") < rows("prose"),
      s"repetitive ${rows("rep")} !< prose ${rows("prose")}")
    assert(rows("prose") < rows("rand"),
      s"prose ${rows("prose")} !< random ${rows("rand")}")
    assert(rows("rep") < 0.2 && rows("rand") > 0.8)
    // empty text is 1.0 by convention, null stays null
    val edge = Seq(Some(""), None).toDF("t")
      .select(compressRatio(col("t")).as("r")).collect()
    assert(edge(0).getDouble(0) === 1.0)
    assert(edge(1).isNullAt(0))
  }

  test("quality_compress lane: bands partition the corpus per language") {
    val out = graft.queries.PipelineQueries.qualityCompress(spark, sf())
    val langs = graft.Tables.documents(spark, sf())
      .select(countDistinct(col("lang"))).head().getLong(0)
    assert(out.count() === langs)
    // every doc lands in exactly one language row; bands never exceed it
    val tot = out.agg(sum("n_docs"), sum("n_repetitive"),
      sum("n_incompressible")).head()
    assert(tot.getLong(0) ===
      graft.Tables.documents(spark, sf()).count())
    assert(tot.getLong(1) + tot.getLong(2) <= tot.getLong(0))
    assert(out.filter(col("mean_ratio") <= 0.0 ||
      col("mean_ratio") > 1.5).count() === 0)
  }
}
