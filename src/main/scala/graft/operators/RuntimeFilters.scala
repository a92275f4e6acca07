package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Runtime join-input pruning: reduce the build side of a join to a
  * fixed-size Bloom filter and apply it to the probe side BEFORE the
  * shuffle, so only rows that can possibly match pay shuffle I/O.
  *
  * This is the explicit, composable form of what Spark's own
  * `InjectRuntimeFilter` rule does when its size thresholds allow
  * (spark.sql.optimizer.runtime.bloomFilter.*): at 100 TB the fact
  * side of a selective join is dominated by rows that will be dropped
  * AT the join — after they were scanned, serialized, shuffled and
  * sorted. A few-MB filter built in one mergeable aggregate and shipped
  * to every scan task as a constant moves that drop into the scan
  * stage. Bloom filters have no false negatives, so the follow-up
  * exact join returns exactly the unpruned join's rows; false
  * positives only cost a few stray rows through the shuffle, bounded
  * by the filter's fpp.
  *
  * Reference point: the reference engine's JOINs (README.md:606-674
  * analogues) always materialize both inputs fully; this operator is
  * the scale path we add on top, same results by construction.
  */
object RuntimeFilters {

  /** Serialized Bloom filter over the build side's distinct join keys,
    * built with Spark's own mergeable
    * [[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate]]
    * (the sketch behind runtime row-level filtering): partials combine
    * map-side and the blob is `numBits/8` bytes regardless of input
    * size. One extra pass over the (small, usually pre-filtered) build
    * side — the trade every runtime filter makes. */
  def keyBloom(build: DataFrame, keyCol: String,
      estItems: Long = 1L << 20, numBits: Long = 1L << 23): Array[Byte] = {
    import org.apache.spark.sql.GraftExpressionBridge.{catalystExpression, column}
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    val agg = column(new BloomFilterAggregate(
      catalystExpression(xxhash64(col(keyCol))),
      Literal(estItems), Literal(numBits)).toAggregateExpression())
    build.agg(agg.as("bf")).head().getAs[Array[Byte]](0)
  }

  /** Codegen'd `might_contain(filter, xxhash64(key))` predicate over a
    * pre-built filter blob. A null blob (empty build side — see
    * [[keyBloom]]) would fail analysis as a NullType operand; callers
    * must branch on it first, as [[bloomPrunedJoin]] does. */
  def mightContain(bloom: Array[Byte], key: Column): Column = {
    require(bloom != null,
      "null bloom blob (empty build side?) — the join result is empty; " +
        "branch on it instead of building a might_contain predicate")
    import org.apache.spark.sql.GraftExpressionBridge.{catalystExpression, column}
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    column(BloomFilterMightContain(
      catalystExpression(lit(bloom)),
      catalystExpression(xxhash64(key))))
  }

  /** Inner equi-join with the probe side Bloom-pruned before the
    * shuffle. Row-identical to `probe.join(build, probeKey === buildKey)`
    * (no false negatives); the filter sits in the probe's scan stage so
    * non-candidate rows never reach the exchange. */
  def bloomPrunedJoin(probe: DataFrame, build: DataFrame,
      probeKey: String, buildKey: String,
      estItems: Long = 1L << 20, numBits: Long = 1L << 23): DataFrame = {
    val bf = keyBloom(build, buildKey, estItems, numBits)
    if (bf == null)
      // BloomFilterAggregate yields null over zero rows: the build side
      // is empty (or all-null-keyed), so the inner join is provably
      // empty — return that directly with the joined schema instead of
      // letting a NullType blob fail analysis
      probe.limit(0).join(build, col(probeKey) === col(buildKey))
    else
      probe.filter(mightContain(bf, col(probeKey)))
        .join(build, col(probeKey) === col(buildKey))
  }
}
