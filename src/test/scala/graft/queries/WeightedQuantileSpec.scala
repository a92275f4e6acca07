package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WeightedQuantileSpec extends SparkSpec {
  import spark.implicits._

  private def runOn(rows: Seq[(String, Double, Long)])
      : Map[String, (Long, Long, Double, Double, Double)] = {
    val dir = java.nio.file.Files
      .createTempDirectory("wq").toString
    rows.zipWithIndex.map { case ((f, v, w), i) =>
      (i.toLong, i, v, w.toDouble, f, "O", java.sql.Date.valueOf("2024-01-01"))
    }.toDF("l_orderkey", "l_linenumber", "l_extendedprice",
      "l_quantity", "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    RelationalQueries.qWeightedQuantile(spark, dir).collect().map { r =>
      r.getAs[String]("flag") -> ((r.getAs[Long]("n_rows"),
        r.getAs[Long]("total_weight"), r.getAs[Double]("wq25"),
        r.getAs[Double]("wq50"), r.getAs[Double]("wq75")))
    }.toMap
  }

  test("weight mass moves the median where row count would not") {
    // values 1..4, weight 97 on value 1: weighted median = 1 even
    // though the unweighted median of rows is between 2 and 3
    val g = runOn(Seq(("A", 1.0, 97L), ("A", 2.0, 1L), ("A", 3.0, 1L),
      ("A", 4.0, 1L)))
    assert(g("A") === ((4L, 100L, 1.0, 1.0, 1.0)))
  }

  test("exact boundary: cumw*2 == totw picks the crossing value") {
    // weights 1,1 on values 10,20: cumw at 10 is 1, 2*1 >= 2 → the
    // lower-bound rule selects 10 exactly at the 50% line
    val g = runOn(Seq(("A", 10.0, 1L), ("A", 20.0, 1L)))
    assert(g("A")._4 === 10.0)
    // q75: 4*1 >= 3*2 fails at 10 → 20
    assert(g("A")._5 === 20.0)
  }

  test("all-ones weights reduce to the unweighted lower-bound quantile") {
    val vals = (1 to 100).map(_.toDouble)
    val g = runOn(vals.map(v => ("A", v, 1L)))
    assert(g("A")._3 === 25.0 && g("A")._4 === 50.0 && g("A")._5 === 75.0)
  }

  test("random weighted frames match a direct Scala reference") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def samples[A](g: Gen[A], n: Int, seed: Long): List[A] =
      Gen.listOfN(n, g).pureApply(Gen.Parameters.default, Seed(seed))
    def refQuantile(rows: Seq[(Double, Long)], q4: Long): Double = {
      // exact lower-bound rule over (value asc) cumulative weights:
      // first value with 4*cumw >= q4*total
      val sorted = rows.sortBy(_._1)
      val total = rows.map(_._2).sum
      var cum = 0L
      sorted.find { case (_, w) =>
        cum += w; 4 * cum >= q4 * total
      }.get._1
    }
    for (seed <- Seq(11L, 404L)) {
      val gen = for {
        flag <- Gen.oneOf("A", "B", "C")
        v <- Gen.choose(0, 500).map(_ / 10.0) // ties likely
        w <- Gen.choose(1L, 9L)
      } yield (flag, v, w)
      val rows = samples(gen, 300, seed)
      val dir = java.nio.file.Files
        .createTempDirectory(s"wqprop_$seed").toString
      rows.zipWithIndex.map { case ((f, v, w), i) =>
        (i.toLong, i, v, w.toDouble, f, "O",
          java.sql.Date.valueOf("2024-01-01"))
      }.toDF("l_orderkey", "l_linenumber", "l_extendedprice",
        "l_quantity", "l_returnflag", "l_linestatus", "l_shipdate")
        .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
      val got = RelationalQueries.qWeightedQuantile(spark, dir)
        .collect().map { r =>
          r.getAs[String]("flag") -> ((r.getAs[Double]("wq25"),
            r.getAs[Double]("wq50"), r.getAs[Double]("wq75")))
        }.toMap
      rows.groupBy(_._1).foreach { case (f, rs) =>
        val vw = rs.map(t => (t._2, t._3))
        val want = (refQuantile(vw, 1L), refQuantile(vw, 2L),
          refQuantile(vw, 3L))
        assert(got(f) === want, s"flag $f seed $seed")
      }
    }
  }

  test("groups are independent") {
    val g = runOn(Seq(("A", 1.0, 1L), ("A", 9.0, 3L),
      ("B", 5.0, 10L)))
    assert(g("A")._4 === 9.0) // cumw(1)=1, 2*1 < 4; cumw(9)=4 → 9
    assert(g("B")._4 === 5.0)
  }
}
