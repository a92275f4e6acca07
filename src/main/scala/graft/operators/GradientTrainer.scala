package graft.operators

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed model TRAINING as repeated aggregation: a linear
  * probability model fit by full-batch gradient descent, the missing
  * step before [[ModelScoring]] (whose doc declares its weights a
  * placeholder "a real pipeline would load from offline training").
  * Together they close the model-in-the-loop cycle a training-data
  * pipeline runs at scale: train a cheap linear scorer ON the corpus
  * (here: distill the heuristic keep rule into retrainable weights),
  * score every document with it (map-only, [[ModelScoring]]), audit it
  * (`model_auc`).
  *
  * Shape at 100 TB: every iteration is ONE partial-aggregable job over
  * the standardized feature frame — a (1+k)-value decimal sum shuffled
  * to a single reduce — and the driver holds exactly the weight vector
  * (O(#features) state, like [[BpeTrainer]]'s merge list). The feature
  * frame is extracted and standardized ONCE and localCheckpoint-pinned
  * (released on completion), so the per-iteration cost is a scan of
  * (x1..xk, y) doubles, never the raw text. Iterations are a fixed,
  * documented budget (default 10) — total driver jobs = iters + 2.
  *
  * Exact cross-engine replay (the repo's oracle discipline), and why
  * the WEIGHT TRAJECTORY is integer: per-row arithmetic runs in IEEE
  * doubles (deterministic across engines for +,−,×,÷,sqrt), per-row
  * gradient contributions round to 12 dp and sum in decimal(38,12)
  * (partition-order independent), and there are no transcendentals
  * anywhere (the linear-probability gradient is +/×, unlike logistic's
  * sigmoid whose exp() differs across engines in the last ulp). The
  * one step that CANNOT be a rounded double is the weight update:
  * integer-count features keep every intermediate on a coarse decimal
  * grid, so `round(w − lr·g, dp)` lands exactly on a HALF_UP tie that
  * binary doubles cannot represent — engines then disagree by 1 ulp of
  * the cut (observed at both 12 and 6 dp). So weights live in integer
  * MICRO-units and the update is exact integer arithmetic: with the
  * 12-dp gradient sum as the exact integer S12 = Σ·10¹², the step is
  *   Δmicro = sign(S12)·⌊(2·|lrNum·S12| + B) / (2B)⌋,
  *   B = lrDen·n·10⁶
  * — half-away-from-zero rational rounding with no doubles at all,
  * replayed in SQL as HUGEINT division. Scoring converts back via one
  * IEEE divide (w_micro / 1e6), identical in both engines.
  */
object GradientTrainer {

  private def round12(d: Double): Double =
    new JBigDecimal(d).setScale(12, RoundingMode.HALF_UP).doubleValue

  /** Train w ∈ R^(1+k) for y ≈ w0 + Σ w_j·x_j by full-batch GD on MSE
    * over standardized features, learning rate lrNum/lrDen on the mean
    * gradient.
    *
    * @param docs     input frame
    * @param features (name, integer-count column) — raw counts; each is
    *                 standardized to (x − mean)/sd (12 dp, sd 1.0 for
    *                 constant features) before training
    * @param label    0/1 (or any numeric) target column expression
    * @param iters    fixed iteration budget (= driver jobs)
    * @return one row: n_docs, n_iters, w_intercept_micro,
    *         w_<name>_micro..., mse, acc (share of rows where
    *         (ŷ > 0.5) == (y > 0.5)), mse/acc under the FINAL weights
    */
  def train(docs: DataFrame, features: Seq[(String, Column)],
      label: Column, lrNum: Long = 1L, lrDen: Long = 2L,
      iters: Int = 10): DataFrame = {
    require(features.nonEmpty, "at least one feature required")
    require(lrNum > 0 && lrDen > 0, "learning rate must be positive")
    require(iters >= 1 && iters <= 1000,
      s"iters=$iters out of the documented budget [1, 1000]")
    val k = features.size
    // Pin the RAW feature frame (k longs + y — same width as the
    // standardized frame): feature extraction over the documents (the
    // expensive regex/text pass) runs ONCE. The old shape extracted
    // features twice — once for the moment aggregate and once to build
    // the standardized checkpoint (guide §1.2: don't compute things
    // twice); standardization is now a cheap per-scan projection over
    // the pinned longs, bit-identical to the materialized form.
    val (raw, releaseRaw) = graft.util.Checkpoints.pin(docs.select(
      features.map { case (n, c) => c.cast("long").as(n) } :+
        label.cast("double").as("y"): _*))

    // Pass 1: exact integer sums -> means/sds (rounded like the oracle).
    // Moments accumulate in decimal(38,0): Σx² of a long feature (a
    // 100 KB doc's n_chars is 1e5 → x² = 1e10) crosses Long.MaxValue
    // near 1e9 rows — the overflow class the 16× ScaleSmoke sweep
    // caught in global_index_big. Decimal keeps the sums exact at any
    // corpus size; the double conversion happens once, at the same
    // place the long form converted.
    val statAggs = features.flatMap { case (n, _) =>
      Seq(sum(col(n).cast("decimal(38,0)")).as(s"s_$n"),
        sum(col(n).cast("decimal(38,0)") * col(n).cast("decimal(38,0)"))
          .as(s"q_$n"))
    } :+ count(lit(1)).as("n")
    val st = raw.agg(statAggs.head, statAggs.tail: _*).head()
    val n = st.getAs[Long]("n")
    require(n > 0, "empty training frame")
    def dec(name: String): Double =
      st.getAs[java.math.BigDecimal](name).doubleValue()
    val meanSd: Seq[(Double, Double)] = features.map { case (nm, _) =>
      val mean = round12(dec(s"s_$nm") / n)
      val varr = round12(dec(s"q_$nm") / n - mean * mean)
      (mean, if (varr > 0) round12(math.sqrt(varr)) else 1.0)
    }

    // Standardized VIEW over the pinned raw frame: iterations scan the
    // pinned longs and standardize in the projection (4 flops/row —
    // noise next to the per-job floor), never the raw text.
    val xCols = features.zip(meanSd).map { case ((nm, _), (m, sd)) =>
      round((col(nm) - lit(m)) / lit(sd), 12).as(s"x_$nm")
    }
    val x = raw.select(xCols :+ col("y"): _*)
    val release = releaseRaw
    try {
      // ŷ − y with the SAME left-assoc chain and the same single IEEE
      // micro->double divide the oracle SQL spells out.
      def residual(wMicro: Array[Long]): Column =
        features.zipWithIndex.foldLeft(
          lit(wMicro(0)).cast("double") / lit(1000000.0): Column) {
          case (acc, ((nm, _), j)) =>
            acc + (lit(wMicro(j + 1)).cast("double") / lit(1000000.0)) *
              col(s"x_$nm")
        } - col("y")

      // Exact half-away-from-zero step in micro-units (doc above):
      // Δ = sign(a)·⌊(2|a| + B) / (2B)⌋, a = lrNum·S12, B = lrDen·n·10⁶.
      val bigB = BigInt(lrDen) * n * 1000000L
      def stepMicro(s12: JBigDecimal): Long = {
        val a = BigInt(s12.movePointRight(12).toBigIntegerExact) * lrNum
        (a.signum * ((a.abs * 2 + bigB) / (bigB * 2))).toLong
      }

      var w = Array.fill(k + 1)(0L)
      for (_ <- 1 to iters) {
        val r = residual(w)
        val gradAggs = (r +: features.map { case (nm, _) =>
          r * col(s"x_$nm")
        }).zipWithIndex.map { case (c, j) =>
          sum(round(c, 12).cast("decimal(38,12)")).as(s"g$j")
        }
        val g = x.agg(gradAggs.head, gradAggs.tail: _*).head()
        w = w.indices.map { j =>
          w(j) - stepMicro(g.getAs[JBigDecimal](s"g$j"))
        }.toArray
      }

      // Final pass: mse + threshold accuracy under the trained weights,
      // evaluated EAGERLY so the checkpointed frame can be released
      // before returning (the result below is a pure literal row).
      val r = residual(w)
      val pred = r + col("y") // ŷ
      val fin = x.agg(
        round(sum(round(r * r, 12).cast("decimal(38,12)"))
          .cast("double") / lit(n), 6).as("mse"),
        round(sum(((pred > 0.5) === (col("y") > 0.5)).cast("long"))
          .cast("double") / lit(n), 6).as("acc")).head()
      val weightCols = ("intercept" +: features.map(_._1)).zipWithIndex
        .map { case (nm, j) => lit(w(j)).as(s"w_${nm}_micro") }
      docs.sparkSession.range(1).select(
        Seq(lit(n).as("n_docs"), lit(iters.toLong).as("n_iters")) ++
          weightCols ++ Seq(lit(fin.getDouble(0)).as("mse"),
            lit(fin.getDouble(1)).as("acc")): _*)
    } finally release()
  }
}
