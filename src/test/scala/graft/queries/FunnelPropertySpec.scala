package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based coverage for the order-sensitive event folds: random
  * event histories checked against straightforward in-memory Scala
  * reference implementations of the same greedy semantics. */
class FunnelPropertySpec extends SparkSpec {
  import spark.implicits._

  private val HOUR = 3600L * 1000000L
  private val WIN = 24 * HOUR
  private val types = Seq("view", "click", "purchase", "signup", "error")

  private def samples[A](g: Gen[A], n: Int, seed: Long): List[A] =
    Gen.listOfN(n, g).pureApply(Gen.Parameters.default, Seed(seed))

  // random histories: ~40 users, up to 30 events each, timestamps in a
  // 3-day span so the 24 h window actually cuts some chains
  private def genEvents(seed: Long): Seq[(Long, Long, Long, String)] = {
    val gen = for {
      user <- Gen.choose(1L, 40L)
      us <- Gen.choose(0L, 72L * HOUR)
      t <- Gen.oneOf(types)
    } yield (user, us, t)
    samples(gen, 600, seed).zipWithIndex.map { case ((u, us, t), i) =>
      (i.toLong, us, u, t)
    }
  }

  /** Reference greedy windowed funnel over one user's (us, id, type)
    * history. */
  private def refFunnel(ev: Seq[(Long, Long, String)]): Int = {
    var (l1, l2, l3) = (-1L, -1L, -1L)
    ev.sortBy(e => (e._1, e._2)).foreach { case (t, _, et) =>
      if (l1 == -1L && et == "view") l1 = t
      else if (l1 != -1L && l2 == -1L && et == "click" &&
        t > l1 && t <= l1 + WIN) l2 = t
      else if (l2 != -1L && l3 == -1L && et == "purchase" &&
        t > l2 && t <= l1 + WIN) l3 = t
    }
    if (l3 != -1L) 3 else if (l2 != -1L) 2 else if (l1 != -1L) 1 else 0
  }

  /** Reference greedy non-overlapping view…purchase counter. */
  private def refSeqCount(ev: Seq[(Long, Long, String)]): Long = {
    var armed = false; var n = 0L
    ev.sortBy(e => (e._1, e._2)).foreach { case (_, _, et) =>
      if (et == "view") armed = true
      else if (et == "purchase" && armed) { n += 1; armed = false }
    }
    n
  }

  test("random histories: funnel fold and sequence count match the " +
    "Scala reference") {
    for (seed <- Seq(7L, 99L, 2026L)) {
      val rows = genEvents(seed)
      val dir = java.nio.file.Files
        .createTempDirectory(s"funnel_prop_$seed").toString
      rows.toDF("event_id", "us", "user_id", "event_type")
        .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
          col("user_id"), col("event_type"),
          lit(0.0).as("value"), lit("{}").as("props"))
        .write.mode("overwrite").parquet(s"$dir/events.parquet")

      val perUser = rows.groupBy(_._3).map { case (u, es) =>
        u -> es.map(e => (e._2, e._1, e._4))
      }
      val wantF = perUser.map { case (u, es) => u -> refFunnel(es) }
      val wantS = perUser.map { case (u, es) => u -> refSeqCount(es) }

      val gotF = EventQueries.funnelConversion(spark, dir).collect()
        .map(r => r.getAs[Long]("user_id") ->
          r.getAs[Int]("funnel_level")).toMap
      val gotS = EventQueries.sequenceCount(spark, dir).collect()
        .map(r => r.getAs[Long]("user_id") ->
          r.getAs[Long]("n_sequences")).toMap
      assert(gotF === wantF, s"funnel mismatch, seed=$seed")
      assert(gotS === wantS, s"sequence count mismatch, seed=$seed")
      // the generators must exercise non-trivial outcomes
      assert(wantF.values.toSet.size >= 3, s"degenerate funnel seed=$seed")
      assert(wantS.values.exists(_ > 0), s"degenerate seq seed=$seed")
    }
  }
}
