package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** AnnEval: recall accounting edge cases and the exact-reference
  * ranking on a hand fixture. */
class AnnEvalSpec extends SparkSpec {
  import spark.implicits._

  test("l2MicroTopK ranks by exact integer distance with id ties") {
    val corpus = Seq(
      (1L, Seq(0.0f, 0.0f)), (2L, Seq(1.0f, 0.0f)),
      (3L, Seq(0.0f, 1.0f)), (4L, Seq(2.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val probes = corpus.filter(col("vec_id") === 1L)
    val got = AnnEval.l2MicroTopK(corpus, probes, "vec_id", "embedding",
      k = 3).collect().map(r => (r.getLong(1), r.getLong(2))).sorted
    // dist(2)=dist(3)=1e12 (tie -> lower id first), dist(4)=4e12
    assert(got.toSeq == Seq((1L, 2L), (2L, 3L), (3L, 4L)))
  }

  test("recallAtK counts hits, tolerates misses and empty approx") {
    val exact = Seq((1L, 10L), (1L, 11L), (2L, 20L), (2L, 21L))
      .toDF("probe_id", "cand_id")
    val approx = Seq((1L, 10L), (1L, 99L)).toDF("probe_id", "cand_id")
    val got = AnnEval.recallAtK(approx, exact).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    assert(got(1L) == ((1L, 2L, 0.5)))
    assert(got(2L) == ((0L, 2L, 0.0))) // no approx rows at all
  }

  test("recall of the exact result against itself is 1.0") {
    val exact = Seq((1L, 10L), (1L, 11L)).toDF("probe_id", "cand_id")
    val got = AnnEval.recallAtK(exact, exact).collect()
    assert(got.forall(_.getDouble(3) == 1.0))
  }
}
