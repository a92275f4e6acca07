package graft.operators

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import graft.{SparkSpec, Tables}
import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.functions._

/** GradientTrainer: the distributed GD trajectory equals an
  * independent driver-side replay of the same exact arithmetic, MSE
  * decreases with the iteration budget, degenerate features are safe,
  * and the lane's teacher-distillation recovers the heuristic rule on
  * real data. */
class GradientTrainerSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = Seq(
    (3L, 1L, 10L, 1.0), (8L, 0L, 40L, 0.0),
    (5L, 2L, 20L, 1.0), (9L, 1L, 50L, 0.0),
    (2L, 3L, 15L, 1.0), (7L, 0L, 45L, 0.0)
  ).toDF("a", "b", "c", "y")

  private def feats = Seq[(String, org.apache.spark.sql.Column)](
    ("a", col("a")), ("b", col("b")), ("c", col("c")))

  test("distributed trajectory equals a driver-side exact replay") {
    val iters = 3
    val got = GradientTrainer.train(fixture, feats, col("y"),
      lrNum = 1L, lrDen = 2L, iters = iters).head()

    // Independent replay: same arithmetic, plain Scala over collected
    // rows (BigDecimal HALF_UP rounding, BigInt step division).
    def r12(d: Double): Double =
      new JBigDecimal(d).setScale(12, RoundingMode.HALF_UP).doubleValue
    val rows = fixture.collect().map(r =>
      (Array(r.getLong(0), r.getLong(1), r.getLong(2)), r.getDouble(3)))
    val n = rows.length
    val stats = (0 until 3).map { j =>
      val s = rows.map(_._1(j)).sum
      val q = rows.map(v => v._1(j) * v._1(j)).sum
      val m = r12(s.toDouble / n)
      val v = r12(q.toDouble / n - m * m)
      (m, if (v > 0) r12(math.sqrt(v)) else 1.0)
    }
    val xs = rows.map { case (f, y) =>
      ((0 until 3).map(j => r12((f(j) - stats(j)._1) / stats(j)._2))
        .toArray, y)
    }
    val bigB = BigInt(2) * n * 1000000L
    var w = Array.fill(4)(0L)
    for (_ <- 1 to iters) {
      val sums = Array.fill(4)(BigInt(0))
      for ((x, y) <- xs) {
        val wd = w.map(_.toDouble / 1000000.0)
        val res = wd(0) + wd(1) * x(0) + wd(2) * x(1) + wd(3) * x(2) - y
        for (j <- 0 to 3) {
          val contrib = if (j == 0) res else res * x(j - 1)
          sums(j) += BigInt(new JBigDecimal(contrib)
            .setScale(12, RoundingMode.HALF_UP).movePointRight(12)
            .toBigIntegerExact)
        }
      }
      w = w.indices.map { j =>
        val a = sums(j)
        w(j) - (a.signum * ((a.abs * 2 + bigB) / (bigB * 2))).toLong
      }.toArray
    }
    assert(got.getAs[Long]("w_intercept_micro") == w(0))
    assert(got.getAs[Long]("w_a_micro") == w(1))
    assert(got.getAs[Long]("w_b_micro") == w(2))
    assert(got.getAs[Long]("w_c_micro") == w(3))
    assert(got.getAs[Long]("n_docs") == n.toLong)
  }

  test("mse is non-increasing in the iteration budget") {
    val mses = Seq(1, 2, 4, 8).map { it =>
      GradientTrainer.train(fixture, feats, col("y"), iters = it)
        .head().getAs[Double]("mse")
    }
    assert(mses.zip(mses.tail).forall { case (a, b) => b <= a },
      s"mse not monotone: $mses")
  }

  test("constant feature takes the sd=1 fallback and stays at weight 0") {
    val df = fixture.withColumn("k", lit(7L))
    val got = GradientTrainer.train(df,
      feats :+ (("k", col("k"))), col("y"), iters = 5).head()
    assert(got.getAs[Long]("w_k_micro") == 0L)
    assert(!got.getAs[Double]("mse").isNaN)
  }

  test("iteration budget is enforced") {
    intercept[IllegalArgumentException] {
      GradientTrainer.train(fixture, feats, col("y"), iters = 0)
    }
    intercept[IllegalArgumentException] {
      GradientTrainer.train(fixture, feats, col("y"), iters = 1001)
    }
  }

  test("lane distills the heuristic keep rule on real documents") {
    val MS = ModelScoring
    val dd = Tables.documents(spark, sf())
    val fs = MS.features.map { case (n, _, f) => (n, f(col("text"))) }
    val teacher = MS.features.map { case (_, wt, f) =>
      f(col("text")).cast("long") * lit(wt)
    }.foldLeft(lit(MS.interceptMicro).cast("long"))(_ + _)
    val got = GradientTrainer.train(dd, fs,
      (teacher > 0L).cast("long"), iters = 10).head()
    assert(got.getAs[Double]("acc") >= 0.9,
      s"teacher recovery acc ${got.getAs[Double]("acc")} < 0.9")
    assert(got.getAs[Double]("mse") < 0.25) // better than predict-mean
  }
}
