package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Vocabulary id assignment and z-score outlier flags. */
class VocabOutlierSpec extends SparkSpec {

  test("vocab ids are contiguous, rank-ordered, min-count cut applied") {
    val v = PipelineQueries.vocabBuild(spark, sf())
      .orderBy("token_id").collect()
    assert(v.nonEmpty)
    assert(v.map(_.getAs[Long]("token_id")).toSeq ===
      (0L until v.length.toLong))
    val counts = v.map(_.getAs[Long]("cnt")).toSeq
    assert(counts === counts.sorted(Ordering[Long].reverse))
    assert(counts.forall(_ >= 5L))
    // ties break lexicographically by token
    counts.zip(counts.drop(1)).zipWithIndex.foreach {
      case ((a, b), i) if a == b =>
        assert(v(i).getAs[String]("token") < v(i + 1).getAs[String]("token"))
      case _ =>
    }
  }

  test("z-score flags exactly the hand-computed tail rows") {
    import spark.implicits._
    // group "g": nine 100s and one 1000 — the 1000 is the outlier
    val df = Seq.fill(9)(("g", 100.0)).appended(("g", 1000.0))
      .toDF("l_returnflag", "l_extendedprice")
      .select(col("l_returnflag"),
        round(col("l_extendedprice") * 100).cast("long").as("c"))
    val n = 10.0
    val mu = (9 * 100.0 + 1000.0) / n
    val sigma = math.sqrt(
      (9 * 100.0 * 100.0 + 1000.0 * 1000.0) / n - mu * mu)
    val flagged = Seq(100.0, 1000.0).count(x => math.abs(x - mu) > 1.5 * sigma)
    assert(flagged === 1) // sanity on the hand math: only the 1000
    // the lane's arithmetic on the same fixture (inlined from the query)
    val stats = df.groupBy("l_returnflag").agg(
      count(lit(1)).as("n"), sum(col("c")).as("s1"),
      sum((col("c") * col("c")).cast("decimal(38,0)")).as("s2"))
      .select(col("l_returnflag"),
        (col("s1").cast("double") / (col("n") * 100.0)).as("mu"),
        sqrt(col("s2").cast("double") / (col("n") * 10000.0) -
          (col("s1").cast("double") / (col("n") * 100.0)) *
            (col("s1").cast("double") / (col("n") * 100.0))).as("sigma"))
    val out = df.join(broadcast(stats), Seq("l_returnflag"))
      .filter(abs(col("c") / 100.0 - col("mu")) > lit(1.5) * col("sigma"))
      .collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("c") === 100000L)
  }
}
