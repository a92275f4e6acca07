package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-dimension lookup ("which band does this value fall in") as
  * a bucketized BROADCAST HASH join.
  *
  * The naive form — `fact JOIN dim ON v >= lo AND v < hi` — has no
  * equi-key, so Spark plans BroadcastNestedLoopJoin: every fact row
  * scans every dim interval, O(|fact|·|dim|) comparisons. Fine for 5
  * bands, fatal for a 100k-interval dim (IP→geo, tariff tables) at
  * 100 TB of facts.
  *
  * Rewrite: explode each half-open interval [lo, hi) into the
  * fixed-width buckets it overlaps; a fact row computes its bucket with
  * the same floor-division; join on the bucket (hash, broadcastable)
  * and re-check the residual range predicate. Per fact row the work is
  * one hash probe plus the handful of intervals sharing its bucket —
  * independent of |dim|. The scan stays map-only: the exploded dim
  * broadcasts, facts never shuffle.
  *
  * `bucketWidth` trades dim blow-up (span/width rows per interval)
  * against probe selectivity; pick it near the median interval span.
  * All arithmetic is exact long floor-division (negative-safe), so the
  * rewrite is semantics-preserving for any long values.
  */
object IntervalLookup {

  /** Exact floor division of a long column by a positive width (the
    * numerator is divisible by construction, so the double division is
    * exact and the cast back to long lossless). */
  private def floorDiv(v: org.apache.spark.sql.Column, w: Long) =
    ((v - pmod(v, lit(w))) / lit(w)).cast("long")

  /** Join `facts` to the interval dim on
    * `facts.valueCol ∈ [dim.loCol, dim.hiCol)`. Empty intervals
    * (hi <= lo) never match and are dropped up front. `joinType` may be
    * "inner" or "left_outer" (unmatched facts keep null dim columns).
    * The result carries all fact columns plus all dim columns except
    * lo/hi bounds. */
  def lookup(facts: DataFrame, valueCol: String, dim: DataFrame,
      loCol: String, hiCol: String, bucketWidth: Long,
      joinType: String = "inner"): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val exploded = dim
      .filter(col(hiCol) > col(loCol))
      .withColumn("_ilk_bucket", explode(sequence(
        floorDiv(col(loCol).cast("long"), bucketWidth),
        floorDiv(col(hiCol).cast("long") - 1, bucketWidth))))
    // floor (not cast-truncation): for negative fractional values
    // truncation rounds toward the NEXT interval's bucket and the pair
    // would be missed; floor(v) always lands in [lo, hi-1]'s bucket span
    val probed = facts.withColumn("_ilk_bucket",
      floorDiv(floor(col(valueCol)).cast("long"), bucketWidth))
    val residual = col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol)
    val joined = joinType match {
      case "inner" =>
        probed.join(broadcast(exploded),
          probed("_ilk_bucket") === exploded("_ilk_bucket") && residual,
          "inner")
      case "left_outer" | "left" =>
        probed.join(broadcast(exploded),
          probed("_ilk_bucket") === exploded("_ilk_bucket") && residual,
          "left_outer")
      case other =>
        throw new IllegalArgumentException(s"unsupported joinType $other")
    }
    joined.drop("_ilk_bucket").drop(loCol, hiCol)
  }
}
