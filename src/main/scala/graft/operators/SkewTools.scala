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
    * The salt is a deterministic hash of the whole row's fingerprint
    * (spark_partition_id + a monotonic id would also do): uniform,
    * reproducible, no RNG in the plan.
    */
  def saltedCountSum(df: DataFrame, keyCol: String, sumCol: String,
      saltBuckets: Int = 16): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(xxhash64(col(keyCol), monotonically_increasing_id()),
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
    * smallReplicated, joinCond) ready to compose. */
  def saltedJoinSides(big: DataFrame, small: DataFrame, bigKey: String,
      smallKey: String, saltBuckets: Int = 16):
      (DataFrame, DataFrame, Column) = {
    val bigSalted = big.withColumn("_salt",
      pmod(xxhash64(col(bigKey), monotonically_increasing_id()),
        lit(saltBuckets.toLong)))
    val smallRep = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(saltBuckets - 1L))))
    val cond = col(bigKey) === col(smallKey) &&
      bigSalted("_salt") === smallRep("_salt")
    (bigSalted, smallRep, cond)
  }
}
