package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SessionizeStreamSpec extends SparkSpec {

  test("stateful streaming sessions agree with the batch window form") {
    val streamed = SessionizeStream.run(spark, sf(), "spec_sessions")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("closed_sessions"),
        sum(col("n_events")).as("events_in_closed"))
    val batch = graft.queries.EventQueries.sessionize(spark, sf())
    val joined = streamed.join(batch, Seq("user_id"))
    // closed sessions ⊆ all sessions; events in closed ≤ user's events
    assert(joined.filter(col("closed_sessions") > col("n_sessions"))
      .count() === 0)
    assert(joined.filter(col("events_in_closed") > col("n_events"))
      .count() === 0)
    // sessions respect the 30-min gap: every closed session's span
    // is consistent (start <= end, events >= 1)
    val bad = SessionizeStream.run(spark, sf(), "spec_sessions2")
      .filter(col("session_start") > col("session_end") ||
        col("n_events") < 1)
    assert(bad.count() === 0)
  }
}
