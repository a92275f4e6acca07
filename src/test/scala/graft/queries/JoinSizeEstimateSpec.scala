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
}
