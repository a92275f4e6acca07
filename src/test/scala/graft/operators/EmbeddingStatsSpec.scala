package graft.operators

import graft.SparkSpec

/** Centroid stats on known vectors. */
class EmbeddingStatsSpec extends SparkSpec {

  import spark.implicits._

  test("centroid micro-sums are exact for hand vectors") {
    val emb = Seq(
      ("a", Array(1.0f, 2.0f)),
      ("a", Array(3.0f, 4.0f)),
      ("b", Array(0.5f, -0.5f)))
      .toDF("label", "embedding")
    val got = EmbeddingStats.centroidStats(emb, "label", "embedding")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(got(("a", 0L)) === (4000000L, 2L)) // 1.0 + 3.0 in micro-units
    assert(got(("a", 1L)) === (6000000L, 2L))
    assert(got(("b", 0L)) === (500000L, 1L))
    assert(got(("b", 1L)) === (-500000L, 1L)) // floor(-0.5e6) = -500000
    // centroid reconstruction: sum_micro / (n * 1e6)
    assert(got(("a", 0L))._1.toDouble / (2 * 1e6) === 2.0)
  }
}
