package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ANN quality evaluation IN the engine: recall@k of an approximate
  * search result against the exact reference, as a DataFrame op — the
  * harness that tunes nProbe/code budgets on a corpus sample before a
  * 100 TB index build, kept inside the engine so the measurement scales
  * with the sample instead of a driver-side script.
  *
  * The exact reference here is integer-micro L2 ([[l2MicroTopK]]):
  * micro-quantized components make every distance an exact integer, so
  * the reference itself — and therefore the recall numbers — replay
  * engine-for-engine (the same portability move as
  * [[ProductQuantizer]]; float cosine would be rank-stable but not
  * hash-stable at ties).
  */
object AnnEval {

  /** Exact top-k by integer-micro squared L2 distance:
    * (probe_id, rk, cand_id, dist). One (probe, cand) aggregation over
    * the component join — P·N·D rows; the eval runs on a corpus
    * SAMPLE, never the full index. Ties break to the lower cand_id. */
  def l2MicroTopK(corpus: DataFrame, probes: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    def comps(df: DataFrame, as: String) =
      df.select(col(idCol).as(as),
        posexplode(col(vecCol)).as(Seq("dim", "v")))
        .select(col(as), col("dim"),
          floor(col("v").cast("double") * 1000000L).cast("long")
            .as(s"vm_$as"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("dist").asc, col("cand_id").asc)
    comps(corpus, "cand_id")
      .join(broadcast(comps(probes, "probe_id")), Seq("dim"))
      .filter(col("cand_id") =!= col("probe_id"))
      .groupBy(col("probe_id"), col("cand_id"))
      .agg(sum((col("vm_cand_id") - col("vm_probe_id")) *
        (col("vm_cand_id") - col("vm_probe_id"))).as("dist"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("probe_id"), col("rk"), col("cand_id"), col("dist"))
  }

  /** recall@k: per probe, the fraction of `exact`'s candidates that
    * `approx` recovered. Both inputs carry (probe_id, cand_id); k is
    * taken from the exact side's row count per probe, so truncated
    * approximate results lower recall instead of erroring. */
  def recallAtK(approx: DataFrame, exact: DataFrame): DataFrame = {
    val hits = exact.select("probe_id", "cand_id")
      .join(approx.select("probe_id", "cand_id"),
        Seq("probe_id", "cand_id"), "left_semi")
    val perProbe = exact.groupBy("probe_id")
      .agg(count(lit(1)).as("n_exact"))
    hits.groupBy("probe_id").agg(count(lit(1)).as("n_hits"))
      .join(perProbe, Seq("probe_id"), "right")
      .select(col("probe_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        col("n_exact"),
        round(coalesce(col("n_hits"), lit(0L)).cast("double") /
          col("n_exact"), 4).as("recall"))
  }
}
