package graft

import org.apache.spark.sql.functions._

/** Evidence that AQE's skew-join splitting engages on the join shapes
  * this library emits — the runtime half of the skew story (the
  * compile-time half is the explicit salting in
  * [[graft.operators.SkewTools]], exercised by `salted_join`).
  *
  * A 100 TB join with a hub key (one user with half the events, one
  * viral document with half the links) lands all its rows in one
  * reducer unless either (a) the code salts the key, or (b) AQE splits
  * the oversized partition at runtime. This spec manufactures a
  * hub-skewed sort-merge join and asserts the executed plan shows
  * `isSkew=true` splits under thresholds a production job would carry.
  */
class AqeSkewSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits the hub partition of a skewed sort-merge join") {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // thresholds sized to the fixture (defaults target 256 MB
      // partitions; the mechanism under test is identical)
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val prior = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // hub key 0 carries 50k rows with a fat payload; 99 tail keys
      // carry 500 each
      val left = spark.range(0, 100000L)
        .select(when($"id" < 50000L, 0L).otherwise($"id" % 99L + 1L)
          .as("k"),
          concat(lit("x"), lpad($"id".cast("string"), 64, "0"))
            .as("payload"))
      val right = spark.range(0, 100L).select($"id".as("k"),
        lit("dim").as("tag"))
      // max(payload) keeps the fat column alive through pruning — skew
      // detection is shuffle-BYTE-based, so the hub partition must
      // actually carry bytes. The downstream aggregate is deliberately
      // UNGROUPED: a keyed aggregate (e.g. countDistinct(k)) would
      // reuse the join's k-distribution, and OptimizeSkewedJoin
      // declines to split partitions another operator relies on — the
      // same reason a production job sees skew splits on join→project
      // pipelines but not join→same-key-groupBy ones.
      val joined = left.join(right, "k")
        .agg(count(lit(1)).as("n"), max($"payload").as("mp"))
      // drive THIS plan to completion (head() would execute a separate
      // CollectLimit plan and leave this one un-finalized)
      joined.queryExecution.toRdd.foreach(_ => ())
      val row = joined.head()
      assert(row.getAs[Long]("n") === 100000L)
      val plan = joined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(plan.contains("isSkew=true") || plan.contains("skew=true"),
        s"expected a skew-split join in the final plan:\n$plan")
    } finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
