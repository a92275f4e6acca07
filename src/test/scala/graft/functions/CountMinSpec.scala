package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Count-Min sketch aggregate: guarantees, merge-order independence,
  * and Java/declarative bucket agreement. */
class CountMinSpec extends SparkSpec {

  import CountMinFunctions._
  import spark.implicits._

  private def estimates(depth: Int, width: Int) = {
    val ev = graft.Tables.events(spark, sf()).select(col("event_type"))
    val sketch = ev.agg(countMin(col("event_type"), depth, width).as("sk"))
    ev.groupBy("event_type").agg(count(lit(1)).as("exact"))
      .crossJoin(broadcast(sketch))
      .select(col("event_type"),
        countMinEstimate(col("sk"), col("event_type"), depth, width)
          .as("est"),
        col("exact"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
  }

  test("estimate is never below the true count; exact when collision-free") {
    val e = estimates(4, 256)
    assert(e.nonEmpty)
    e.foreach { case (k, (est, exact)) =>
      assert(est >= exact, s"$k underestimated")
    }
    // 5 keys in 4 independent 256-slot rows: verified collision-free
    e.foreach { case (k, (est, exact)) =>
      assert(est === exact, s"$k unexpectedly collided")
    }
  }

  test("width 1 collapses every key to the stream total") {
    val total = graft.Tables.events(spark, sf()).count()
    estimates(2, 1).foreach { case (_, (est, _)) =>
      assert(est === total)
    }
  }

  test("sketch is merge-order independent (1 vs 8 partitions)") {
    val ev = graft.Tables.events(spark, sf()).select(col("event_type"))
    def sk(parts: Int) = ev.repartition(parts)
      .agg(countMin(col("event_type"), 4, 64).as("sk"))
      .head().getSeq[Seq[Long]](0)
    assert(sk(1) === sk(8))
  }

  test("declarative bucket matches the aggregate's Java hashing") {
    // one-key sketch: the single nonzero cell of each row must sit at
    // the declarative cmsBucket position
    val one = Seq("the-key").toDF("k")
    val sketch = one.agg(countMin(col("k"), 3, 32).as("sk"))
      .head().getSeq[scala.collection.Seq[Long]](0)
    val buckets = one.select((0 until 3).map(r =>
      cmsBucket(col("k"), r, 32).as(s"b$r")): _*).head()
    (0 until 3).foreach { r =>
      val row = sketch(r)
      assert(row(buckets.getLong(r).toInt) === 1L)
      assert(row.sum === 1L)
    }
  }
}
