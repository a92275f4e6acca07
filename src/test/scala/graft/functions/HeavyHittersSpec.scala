package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Misra-Gries TypedImperativeAggregate: exact regime (capacity >
  * vocabulary), lossy-regime guarantees, and cross-partition merges
  * (partial buffers serialize between stages). */
class HeavyHittersSpec extends SparkSpec {

  import spark.implicits._

  // 300×"a", 200×"b", 30×"c", 20 singletons; N = 550
  private lazy val stream = (
    Seq.fill(300)("a") ++ Seq.fill(200)("b") ++ Seq.fill(30)("c") ++
      (1 to 20).map(i => s"rare$i"))
  private lazy val df = stream.toDF("tok").repartition(8) // force merges

  private def summary(k: Int): Map[String, Long] =
    df.agg(SketchFunctions.heavyHitters(col("tok"), k).as("hh"))
      .select(explode(col("hh"))).as[(String, Long)].collect().toMap

  test("capacity above the vocabulary gives exact counts") {
    val got = summary(k = 100)
    assert(got("a") === 300L)
    assert(got("b") === 200L)
    assert(got("c") === 30L)
    assert(got.size === 23)
  }

  test("small capacity keeps every above-threshold item within bounds") {
    val k = 4
    val n = stream.size.toLong
    val got = summary(k)
    // guarantee: freq > N/(k+1)=110 must survive any merge order
    assert(got.contains("a") && got.contains("b"))
    // counts are lower bounds, off by at most N/(k+1)
    Seq("a" -> 300L, "b" -> 200L).foreach { case (t, exact) =>
      assert(got(t) <= exact, s"$t overestimated")
      assert(got(t) >= exact - n / (k + 1), s"$t underestimated too far")
    }
    assert(got.size <= k)
  }

  test("nulls are ignored") {
    val got = Seq(Some("x"), None, Some("x"), None).toDF("tok")
      .agg(SketchFunctions.heavyHitters(col("tok"), 4).as("hh"))
      .select(explode(col("hh"))).as[(String, Long)].collect().toMap
    assert(got === Map("x" -> 2L))
  }
}
