package graft.util

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Lifecycle contract of the checkpoint-release util: pin materializes
  * and registers blocks, release drops exactly them (idempotently),
  * and releaseAll leaves the session's persistent-RDD registry empty —
  * the properties the bench sweep and the iterative operators'
  * round-N−1 releases rely on. */
class CheckpointsSpec extends SparkSpec {
  import spark.implicits._

  private def pinnedCount: Int =
    spark.sparkContext.getPersistentRDDs.size

  test("pin registers blocks; release drops exactly its own") {
    Checkpoints.releaseAll(spark)
    val before = pinnedCount
    val (a, releaseA) = Checkpoints.pin(
      (1 to 1000).toDF("x").withColumn("y", col("x") * 2))
    val (b, releaseB) = Checkpoints.pin((1 to 500).toDF("z"))
    assert(pinnedCount > before, "pin must register persistent RDDs")
    val afterBoth = pinnedCount
    // the checkpointed frames are live and correct
    assert(a.count() === 1000L && b.count() === 500L)
    releaseA()
    assert(pinnedCount < afterBoth, "releaseA must drop a's blocks")
    // b survives a's release untouched
    assert(b.count() === 500L)
    releaseA() // idempotent: second call is a no-op, not an error
    releaseB()
    assert(pinnedCount === before)
  }

  test("releaseAll empties the registry; rebuilt frames still compute") {
    val (a, _) = Checkpoints.pin((1 to 100).toDF("x"))
    assert(a.count() === 100L)
    assert(pinnedCount > 0)
    Checkpoints.releaseAll(spark)
    assert(pinnedCount === 0,
      "releaseAll must unpersist every registered RDD")
    // a lane rebuilding from source (the bench contract) is unaffected
    val (b, releaseB) = Checkpoints.pin((1 to 100).toDF("x"))
    assert(b.count() === 100L)
    releaseB()
  }

  test("iterative release pattern: dropping round N-1 keeps round N valid") {
    Checkpoints.releaseAll(spark)
    var (cur, release) = Checkpoints.pin(Seq(1L).toDF("v"))
    (1 to 5).foreach { _ =>
      val (next, releaseNext) =
        Checkpoints.pin(cur.select((col("v") * 2).as("v")))
      release()
      cur = next; release = releaseNext
    }
    assert(cur.head().getLong(0) === 32L)
    release()
    assert(pinnedCount === 0)
  }
}
