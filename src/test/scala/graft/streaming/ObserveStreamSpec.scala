package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class ObserveStreamSpec extends SparkSpec {

  test("streaming observe totals equal the batch aggregate exactly") {
    val got = EventsStream.streamingObservedQuality(
      spark, sf(), "spec_observe").head()
    val want = Tables.events(spark, sf()).agg(
      count(lit(1)).as("n_rows"),
      sum(when(col("value").isNull, 1L).otherwise(0L)).as("n_null_value"),
      sum(round(col("value") * 100).cast("long")).as("sum_cents")).head()
    assert(got.getLong(0) === want.getLong(0))
    assert(got.getLong(1) === want.getLong(1))
    assert(got.getLong(2) === want.getLong(2))
    assert(got.getLong(0) > 0L)
  }
}
