package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class JoinSizeEstimateSpec extends SparkSpec {

  test("CMS join-size estimate upper-bounds the exact join size") {
    val r = EventQueries.joinSizeEstimate(spark, sf()).head()
    val (est, exact) = (r.getAs[Long]("est_rows"),
      r.getAs[Long]("exact_rows"))
    // the inner product only ADDS colliding cross terms — never loses
    // a true (a_k · b_k) contribution — so est ≥ exact always
    assert(est >= exact, s"estimate $est under exact $exact")
    // and the collision term is bounded: ||A||1·||B||1 / width
    val nA = Tables.events(spark, sf()).count()
    val nB = Tables.customer(spark, sf()).count()
    assert(est <= exact + nA * nB / 4096 * 4,
      s"estimate $est far beyond the collision bound")
    assert(exact ===
      Tables.events(spark, sf()).select(col("user_id").as("k"))
        .join(Tables.customer(spark, sf())
          .select(col("c_custkey").as("k")), Seq("k")).count())
  }

  test("streaming CMS monitor prices identically to the batch sketch") {
    val streamed = EventQueries.streamJoinSize(spark, sf()).head()
    val batch = EventQueries.joinSizeEstimate(spark, sf()).head()
    // cell merge is exact → drained registers ≡ batch registers →
    // identical estimate, not merely close
    assert(streamed.getAs[Long]("est_rows") ===
      batch.getAs[Long]("est_rows"))
    assert(streamed.getAs[Long]("exact_rows") ===
      batch.getAs[Long]("exact_rows"))
  }

  test("user sequences: deterministic order and last-50 truncation") {
    val out = EventQueries.userSequences(spark, sf())
    // the cap fires for active users and never exceeds 50
    assert(out.filter(col("n_kept") > 50).count() === 0)
    assert(out.filter(col("n_events") > 50 && col("n_kept") =!= 50)
      .count() === 0)
    // seq length reconciles with n_kept (k events → k-1 separators)
    val bad = out.filter(
      size(split(col("seq"), ">")) =!= col("n_kept")).count()
    assert(bad === 0)
    // spot-check one user's tail order against a window replay
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    // independent row-set derivation (window rank instead of slice);
    // collect_list has no order guarantee, so sort the struct array
    val replay = Tables.events(spark, sf())
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 50)
      .groupBy(col("user_id"))
      .agg(concat_ws(">", transform(
        array_sort(collect_list(
          struct(col("ts"), col("event_id"), col("event_type")))),
        x => x.getField("event_type"))).as("seq2"))
    val joined = out.join(replay, Seq("user_id"))
    assert(joined.filter(col("seq") =!= col("seq2")).count() === 0)
  }
}
