package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Skip-gram generation and PMI arithmetic on hand-computed fixtures. */
class CooccurrenceSpec extends SparkSpec {

  test("skipgrams emits exactly the distance-1 and distance-2 pairs") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d")).toDF("id", "text")
    val got = Cooccurrence.skipgrams(docs, "id", "text", window = 2)
      .select("w1", "w2").as[(String, String)].collect().toSet
    assert(got === Set(
      ("a", "b"), ("b", "c"), ("c", "d"), // distance 1
      ("a", "c"), ("b", "d"))) // distance 2
  }

  test("window=1 reduces to adjacent bigrams; short docs drop out") {
    import spark.implicits._
    val docs = Seq((1L, "x y"), (2L, "solo"), (3L, "")).toDF("id", "text")
    val got = Cooccurrence.skipgrams(docs, "id", "text", window = 1)
      .collect()
    assert(got.length === 1)
    assert(got.head.getAs[String]("w1") === "x")
    assert(got.head.getAs[String]("w2") === "y")
  }

  test("pmi matches the hand computation") {
    import spark.implicits._
    // corpus: "a b" ×3 and "c d" ×2 → window 1 pairs: (a,b)=3, (c,d)=2
    // B=5 pairs, T=10 tokens, c(a)=c(b)=3, c(c)=c(d)=2
    val docs = (1 to 3).map(i => (i.toLong, "a b")) ++
      (4 to 5).map(i => (i.toLong, "c d"))
    val out = Cooccurrence.pmi(docs.toDF("id", "text"), "id", "text",
      window = 1, minPairCount = 2L)
      .collect().map(r => (r.getAs[String]("w1"), r.getAs[String]("w2")) ->
        (r.getAs[Long]("c12"), r.getAs[Double]("pmi"))).toMap
    val pmiAB = math.log((3.0 / 5.0) / ((3.0 / 10.0) * (3.0 / 10.0)))
    val pmiCD = math.log((2.0 / 5.0) / ((2.0 / 10.0) * (2.0 / 10.0)))
    assert(out(("a", "b"))._1 === 3L)
    assert(math.abs(out(("a", "b"))._2 -
      BigDecimal(pmiAB).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        .toDouble) < 1e-9)
    assert(math.abs(out(("c", "d"))._2 -
      BigDecimal(pmiCD).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        .toDouble) < 1e-9)
    // the frequency cut removes nothing here but would cut singletons
    assert(out.keySet === Set(("a", "b"), ("c", "d")))
  }
}
