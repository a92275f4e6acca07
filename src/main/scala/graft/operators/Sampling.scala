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
    * md5(key ++ salt) as an unsigned 32-bit int, scaled by 2^-32.
    * Null keys hash a sentinel instead of propagating null — otherwise
    * null-keyed rows silently vanish from every sample and all land in
    * the LAST split (the null comparison falls through every `when`).
    * (DuckDB twin caveat: its concat skips nulls, so an oracle over
    * nullable keys must coalesce to the same sentinel explicitly.) */
  def hashFraction(key: Column, salt: String = ""): Column =
    conv(substring(md5(concat(
      coalesce(key.cast("string"), lit("\u0000")), lit(salt))), 1, 8),
      16, 10).cast("long") / 4294967296.0

  /** Leakage-safe split: every row of a GROUP lands in the same split,
    * because the split decision hashes the group key, not the row key.
    * With the group = a near-dup cluster id, this is the split rule
    * that keeps near-duplicates from straddling train/eval (row-keyed
    * splitting leaks: two near-identical documents hash independently,
    * and at 100 TB some pair WILL land on both sides of the cut —
    * the held-out set then overlaps the training set semantically).
    * Same hash-threshold mechanics as [[stratifiedSample]]: map-only,
    * deterministic, engine-replayable.
    *
    * @param fractions ordered (name, share) with shares summing to 1;
    *                  cumulative thresholds cut the uniform hash. */
  def leakageSafeSplit(df: DataFrame, groupCol: String,
      fractions: Seq[(String, Double)],
      salt: String = "split"): DataFrame = {
    require(fractions.nonEmpty && fractions.forall(_._2 > 0) &&
      math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      s"fractions must be positive and sum to 1: $fractions")
    require(fractions.map(_._1).distinct.size == fractions.size,
      "split names must be distinct")
    val u = hashFraction(col(groupCol), salt)
    val cum = fractions.map(_._2).scanLeft(0.0)(_ + _).tail
    val split = fractions.zip(cum).init.reverse
      .foldLeft(lit(fractions.last._1): Column) {
        case (acc, ((nm, _), c)) => when(u < c, lit(nm)).otherwise(acc)
      }
    df.withColumn("split", split)
  }

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

  /** Weighted sampling WITHOUT replacement, n per group — the
    * Efraimidis–Spirakis A-ES scheme: each row draws a deterministic
    * uniform u = hashFraction(key, salt) and ranks by u^(1/w); the top
    * n per group are a weight-proportional sample (a row with twice the
    * weight is twice as likely to make the cut). The classic use:
    * quality-weighted corpus subsetting where simple top-k by weight
    * would take ONLY the head and a uniform sample ignores quality.
    *
    * Same determinism contract as every sampler here (pure function of
    * data + salt, engine-replayable md5 arithmetic), and the same
    * WindowGroupLimit scale shape as [[groupQuota]]: map-side prune to
    * n rows per group before the single group-key shuffle. Rows with
    * weight <= 0 are excluded (they have probability 0). */
  def weightedQuota(df: DataFrame, keyCol: String, weightCol: String,
      groupCols: Seq[String], n: Int, salt: String = ""): DataFrame = {
    val esKey = pow(hashFraction(col(keyCol), salt),
      lit(1.0) / col(weightCol).cast("double"))
    groupQuota(
      df.filter(col(weightCol).cast("double") > 0.0)
        .withColumn("_es_key", esKey),
      groupCols, Seq(col("_es_key").desc, col(keyCol).asc), n)
      .drop("_es_key")
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

  /** Temperature-flattened mixture (the multilingual balancing sampler):
    * stratum keep budgets ∝ tokens^alpha, normalized over all strata and
    * scaled to `totalBudget` tokens. alpha = 1 keeps natural proportions,
    * alpha → 0 flattens toward uniform — the standard knob for keeping
    * low-resource languages represented without oversampling the head.
    *
    * Determinism across engines: the float-valued weights tokens^alpha
    * are floored to integer micro-units BEFORE the cross-stratum
    * normalization sum — a float sum over strata would be
    * order-dependent, an integer sum is exact (same trick as
    * [[EmbeddingStats]]). The remaining arithmetic is a fixed-order
    * double expression the DuckDB oracle replays operation for
    * operation.
    *
    * Scale shape: one map-side-combinable token-total aggregate (rows =
    * strata), a 1-row normalizer, both broadcast back; the keep decision
    * is the same map-only hash filter as every sampler here. */
  def temperatureMixture(df: DataFrame, keyCol: String, strataCol: String,
      tokenCol: String, alpha: Double, totalBudget: Long,
      salt: String = ""): DataFrame = {
    val weights = df.groupBy(col(strataCol))
      .agg(sum(col(tokenCol).cast("long")).as("_toks"))
      .withColumn("_w_micro",
        floor(pow(col("_toks").cast("double"), lit(alpha)) * 1e6)
          .cast("long"))
    val z = weights.agg(sum(col("_w_micro")).as("_z_micro"))
    df.join(broadcast(weights), Seq(strataCol))
      .crossJoin(broadcast(z))
      .withColumn("_keep_frac", least(lit(1.0),
        lit(totalBudget.toDouble) * col("_w_micro") / col("_z_micro")
          / col("_toks")))
      .filter(hashFraction(col(keyCol), salt) < col("_keep_frac"))
      .drop("_toks", "_w_micro", "_z_micro", "_keep_frac")
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
