package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling primitives (SURVEY.md §4 / build-brief "salting for
  * skew"). AQE's skew-join split handles most runtime skew; salting is
  * the declarative tool for the pathological hot-key aggregation where a
  * single group key holds a double-digit percentage of a 100 TB table
  * and one reducer would otherwise own it.
  */
object SkewTools {

  /** Two-stage salted aggregation: stage 1 groups on (key, salt) so the
    * hot key fans out over `saltBuckets` reducers; stage 2 combines the
    * partials per key. Correct for any algebraic aggregate expressed as
    * (partial, combine) pairs — counts and sums here, the shapes the
    * reference's Q1-Q4 need.
    *
    * The salt hashes ROW CONTENT ONLY (xxhash64 over every column) —
    * never `monotonically_increasing_id`/`rand`/`spark_partition_id`,
    * all of which depend on partition layout: on a shuffle-fetch-failure
    * retry a recomputed partition would re-salt rows differently between
    * the stage-1 and stage-2 aggregations, duplicating or dropping rows.
    * Content hashing is stable under any recomputation. (Identical rows
    * land in the same bucket; a hot key made of literally identical rows
    * still fans out via the stage-1 map-side partial aggregation.)
    */
  def saltedCountSum(df: DataFrame, keyCol: String, sumCol: String,
      saltBuckets: Int = 16): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*),
        lit(saltBuckets.toLong)))
    salted
      .groupBy(col(keyCol), col("_salt"))
      .agg(count(lit(1)).as("_pcnt"),
        sum(col(sumCol).cast("decimal(38,8)")).as("_psum"))
      .groupBy(col(keyCol))
      .agg(sum(col("_pcnt")).as("cnt"),
        round(sum(col("_psum")).cast("double"), 4).as("total"))
  }

  /** Salted broadcast-side replication for a skewed JOIN key: replicate
    * the small side `saltBuckets` times and salt the big side, so the
    * hot key's rows spread across buckets. Returns (bigSalted,
    * smallReplicated, joinCond) ready to compose. Salt is content-derived
    * (see [[saltedCountSum]]) so retries re-salt identically. */
  def saltedJoinSides(big: DataFrame, small: DataFrame, bigKey: String,
      smallKey: String, saltBuckets: Int = 16):
      (DataFrame, DataFrame, Column) = {
    val bigSalted = big.withColumn("_salt",
      pmod(xxhash64(big.columns.map(col).toIndexedSeq: _*),
        lit(saltBuckets.toLong)))
    val smallRep = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(saltBuckets - 1L))))
    val cond = col(bigKey) === col(smallKey) &&
      bigSalted("_salt") === smallRep("_salt")
    (bigSalted, smallRep, cond)
  }
}
