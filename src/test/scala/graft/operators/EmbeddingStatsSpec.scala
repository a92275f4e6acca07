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

  test("nearest-centroid assignment recovers well-separated groups") {
    // group 1 points along +x, group 2 along +y; all should classify
    // back to their own centroid
    val emb = Seq(
      (1L, 1, Array(1.0f, 0.1f)), (2L, 1, Array(0.9f, -0.1f)),
      (3L, 2, Array(0.1f, 1.0f)), (4L, 2, Array(-0.1f, 0.9f)))
      .toDF("vec_id", "label", "embedding")
    val confusion = EmbeddingStats.nearestCentroidConfusion(
      emb, "vec_id", "label", "embedding")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(confusion === Map((1, 1) -> 2L, (2, 2) -> 2L))
  }
}
