package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The MergeTree-analogue analytic sink (SURVEY.md §1.4, §2.1 S4).
  *
  * Reference: `ENGINE = MergeTree(pickup_date, pickup_datetime, 8192)`
  * (README.md:548) = partition by month of pickup_date, sort by
  * pickup_datetime, sparse index each 8192 rows. Parquet equivalent:
  *   - `partitionBy(monthCol)` directories → partition pruning,
  *   - `sortWithinPartitions(sortCol)` → row-group min/max stats give
  *     the same time-range data skipping the sparse index gives,
  *   - parquet dictionary encoding ≈ Enum8 compression.
  *
  * One `repartition(monthCol)` shuffle co-locates each month before the
  * sorted write — at 100 TB that is the only data movement, and each
  * executor then streams one sorted month file. Skewed months (NYC taxi
  * volume varies ~3×) are handled by AQE rebalancing.
  */
object MergeTreeWriter {

  def write(df: DataFrame, path: String, monthCol: String = "pickup_month",
      sortCol: String = "pickup_datetime"): Unit =
    df.repartition(col(monthCol))
      .sortWithinPartitions(sortCol)
      .write
      .mode("overwrite")
      .partitionBy(monthCol)
      .parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
