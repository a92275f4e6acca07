package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class RestartRecoverySpec extends SparkSpec {

  test("two query incarnations over one checkpoint equal the batch agg " +
      "exactly once, with output genuinely spanning the restart") {
    val (phaseARows, merged) =
      RestartRecovery.hourlyStatsWithRestart(spark, sf())
    val got = merged.cache()
    val total = got.count()

    // the stop landed mid-output: phase A finalized SOME windows
    // (watermark had advanced past slice 0) but not all — otherwise
    // the restart recovered nothing worth testing
    assert(phaseARows > 0L,
      "phase A emitted nothing — restart recovery untested")
    assert(phaseARows < total,
      "phase A emitted everything — nothing crossed the restart")

    // exactly-once: no (window, type) key appears twice across the
    // two incarnations' committed files
    assert(got.groupBy("hour_start", "event_type").count()
      .filter(col("count") > 1).count() === 0L)

    // and the merged output is the batch aggregation, bit-exact
    val batch = Tables.events(spark, sf())
      .groupBy(date_trunc("hour", col("ts")).as("hour_start"),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        round(sum(col("value").cast("decimal(38,8)")).cast("double"), 4)
          .as("sum_value"))
    assert(got.count() === batch.count())
    assert(got.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(got).count() === 0)
    got.unpersist()
  }
}
