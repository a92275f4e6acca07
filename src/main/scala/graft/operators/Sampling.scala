package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling for training-data pipelines:
  * reproducible corpus downsampling, per-stratum rates (e.g. by
  * language), and disjoint train/eval/test splits.
  *
  * Why not `df.sample()` / `TABLESAMPLE`: RNG-based sampling is seeded
  * PER PARTITION, so the selected row set changes with the partition
  * layout (a repartition, a file split, AQE) and can change on task
  * retry — unacceptable when the sample defines a training set that
  * must be reconstructible months later. Hashing a stable key instead
  * gives a sample that is a pure function of the data: any engine, any
  * layout, any day, byte-identical (the same property exploited by the
  * deterministic salt in [[SkewTools]]).
  *
  * The hash is the first 32 bits of md5(key, salt) scaled to [0, 1) —
  * md5 exists in every engine (the DuckDB oracle replays it exactly),
  * and dividing by 2^32 is exact in doubles, so threshold comparisons
  * are bit-identical across engines. Different salts give independent
  * samples; the same salt gives nested samples (a 10% sample is a
  * subset of the 20% sample — handy for scaling-law curves).
  *
  * At 100 TB everything here is a map-only filter fused into the scan
  * stage: no shuffle, no state, trivially parallel.
  */
object Sampling {

  /** Uniform [0, 1) value from a key column: first 8 hex chars of
    * md5(key ++ salt) as an unsigned 32-bit int, scaled by 2^-32. */
  def hashFraction(key: Column, salt: String = ""): Column =
    conv(substring(md5(concat(key.cast("string"), lit(salt))), 1, 8),
      16, 10).cast("long") / 4294967296.0

  /** Keep each row iff hashFraction(key) < fraction. */
  def deterministicSample(df: DataFrame, keyCol: String, fraction: Double,
      salt: String = ""): DataFrame =
    df.filter(hashFraction(col(keyCol), salt) < fraction)

  /** Per-stratum keep rates (stratum value → fraction); strata not in
    * the map keep `default`. The rate table compiles to a literal CASE
    * chain — no join, still map-only. */
  def stratifiedSample(df: DataFrame, keyCol: String, strataCol: String,
      fractions: Map[String, Double], default: Double = 0.0,
      salt: String = ""): DataFrame = {
    val rate = fractions.foldLeft(lit(default): Column) {
      case (acc, (k, f)) => when(col(strataCol) === lit(k), lit(f))
        .otherwise(acc)
    }
    df.filter(hashFraction(col(keyCol), salt) < rate)
  }

  /** Per-group quota: keep at most `n` rows per group, best-first by
    * `rankOrder` (make the last sort key a unique id — ties without one
    * make row_number, and therefore the kept set, nondeterministic).
    * The classic domain-balancing op ("≤ n docs per site").
    *
    * Scale shape: Catalyst rewrites the rank-filter into
    * WindowGroupLimit (Spark 3.5+), which prunes to n rows per group on
    * the MAP side before the single group-key shuffle — a giant domain
    * never ships more than n·tasks rows. */
  def groupQuota(df: DataFrame, groupCols: Seq[String],
      rankOrder: Seq[Column], n: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*).orderBy(rankOrder: _*)
    df.withColumn("_gq_rn", row_number().over(w))
      .filter(col("_gq_rn") <= n).drop("_gq_rn")
  }

  /** Mixture composition (the data-mixing step of a pretraining run):
    * given per-stratum TOKEN budgets, derive each stratum's keep
    * fraction from its measured token total and hash-sample to it —
    * so "2:1 web-to-code" style recipes become a declarative spec.
    *
    * Two passes: a map-side-combinable token-total aggregate (rows =
    * strata count — broadcast-joined back), then the map-only hash
    * filter. The realized budget is approximate in proportion to
    * document-length variance (documents are kept whole); the spec
    * bounds the error. Deterministic end to end: same data + budgets +
    * salt → the same corpus, any layout, any engine. */
  def composeMixture(df: DataFrame, keyCol: String, strataCol: String,
      tokenCol: String, budgets: Map[String, Long],
      salt: String = ""): DataFrame = {
    val totals = df.groupBy(col(strataCol))
      .agg(sum(col(tokenCol).cast("long")).as("_total_toks"))
    val budget = budgets.foldLeft(lit(0L): Column) {
      case (acc, (k, b)) => when(col(strataCol) === lit(k), lit(b))
        .otherwise(acc)
    }
    df.join(broadcast(totals), Seq(strataCol))
      .withColumn("_keep_frac",
        least(lit(1.0), budget.cast("double") / col("_total_toks")))
      .filter(hashFraction(col(keyCol), salt) < col("_keep_frac"))
      .drop("_total_toks", "_keep_frac")
  }

  /** Disjoint, exhaustive split assignment ("train"/"eval"/... with
    * weights summing to ≤ 1; remainder falls into the last split).
    * Same key+salt always lands in the same split, independent of the
    * other rows. */
  def split(df: DataFrame, keyCol: String, weights: Seq[(String, Double)],
      salt: String = ""): DataFrame = {
    require(weights.nonEmpty, "at least one split")
    val h = hashFraction(col(keyCol), salt)
    val cums = weights.map(_._2).scanLeft(0.0)(_ + _).tail
    val labeled = weights.map(_._1).zip(cums).dropRight(1)
      .foldRight(lit(weights.last._1): Column) {
        case ((name, cum), acc) => when(h < cum, lit(name)).otherwise(acc)
      }
    df.withColumn("split", labeled)
  }
}
