package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed embedding statistics: per-group centroids — the class
  * prototypes used for centroid classifiers, cluster summaries, and
  * drift monitoring over embedding columns.
  *
  * Scale shape: `posexplode` turns each vector into (group, dim, value)
  * rows — dim count × row count, but the aggregate is map-side
  * combinable so the shuffle carries only (groups × dims) partial sums.
  * Values are accumulated as exact integer micro-units
  * (`floor(v · 10⁶)` of the float's double value): float addition is
  * not associative, so a double sum would depend on partition order —
  * integer sums are exact and reproducible on any engine, which is also
  * what makes the DuckDB oracle hash-exact. The consumer divides
  * `sum_micro / (n · 10⁶)` for the centroid value.
  */
object EmbeddingStats {

  /** (group, dim, sum_micro, n) per dimension: exact integer centroid
    * numerators. `dim` is 0-based. */
  def centroidStats(emb: DataFrame, groupCol: String,
      vecCol: String): DataFrame =
    emb.select(col(groupCol).as("grp"),
      posexplode(col(vecCol)).as(Seq("dim", "v")))
      .groupBy(col("grp"), col("dim").cast("long").as("dim"))
      .agg(
        sum(floor(col("v").cast("double") * 1000000).cast("long"))
          .as("sum_micro"),
        count(lit(1)).as("n"))
}
