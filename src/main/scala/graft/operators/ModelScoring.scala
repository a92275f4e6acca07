package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model inference as a map-only scan stage: scoring every document of
  * a corpus with a (small) trained model is the workhorse of quality
  * filtering — fastText-style linear classifiers over cheap lexical
  * features, run over billions of rows. The model is resolved to
  * literal weights at plan build, the features are codegen'd regexp
  * counts, and the whole operator is a projection: no shuffle, no UDF,
  * nothing that breaks whole-stage codegen. At 100 TB this runs at scan
  * speed and the only cost question is how many bytes the scan reads.
  *
  * Arithmetic contract: weights are integer MICRO-units (1e-6) and
  * features are integer counts, so the logit is an exact 64-bit
  * integer in any engine — the driver's oracle hash-compares it
  * directly, no float tolerance. (The float sigmoid is deliberately
  * left to callers: exp() differs across engines in the last ulp, and
  * thresholding the logit at 0 is the same decision as thresholding
  * the sigmoid at 0.5.)
  *
  * The weights here are a documented PLACEHOLDER model of the usual
  * shape (length helps, digit soup hurts, punctuation signals prose) —
  * a real pipeline would load them from offline training; the operator
  * shape is what matters.
  */
object ModelScoring {

  /** (name, per-unit micro-weight, feature column builder). */
  val features: Seq[(String, Long, Column => Column)] = Seq(
    ("n_tokens", 12000L, t => regexp_count(t, lit("\\S+"))),
    ("n_digits", -3000L, t => regexp_count(t, lit("[0-9]"))),
    ("n_punct", 8000L, t => regexp_count(t, lit("[.,!?;:]"))),
    ("n_chars", -3000L, t => length(t)))

  /** Intercept in micro-units. */
  val interceptMicro = 250000L

  /** Score `docs`: id, the four feature counts, the exact integer
    * `logit_micro`, and `keep` (logit > 0). One projection over the
    * scan — verify with `.explain`: no Exchange anywhere. */
  def linearQualityScore(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val withFeats = features.foldLeft(docs.select(col(idCol),
      col(textCol).as("_t"))) { case (df, (name, _, f)) =>
      df.withColumn(name, f(col("_t")).cast("long"))
    }
    val logit = features.map { case (name, w, _) =>
      col(name) * lit(w)
    }.foldLeft(lit(interceptMicro).cast("long"))(_ + _)
    withFeats
      .withColumn("logit_micro", logit)
      .withColumn("keep", col("logit_micro") > 0L)
      .drop("_t")
  }
}
