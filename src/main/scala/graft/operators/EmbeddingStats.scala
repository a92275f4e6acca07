package graft.operators

import graft.functions.{VectorFunctions => VF}
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

  /** Centroid VECTORS (group, centroid: array<double>) reassembled from
    * the micro-unit stats — `array_sort` on (dim, value) structs makes
    * the element order deterministic regardless of shuffle order. */
  def centroids(emb: DataFrame, groupCol: String,
      vecCol: String): DataFrame =
    centroidStats(emb, groupCol, vecCol)
      .groupBy(col("grp"))
      .agg(transform(
        array_sort(collect_list(struct(col("dim"),
          (col("sum_micro").cast("double") /
            (col("n") * 1000000L).cast("double")).as("v")))),
        x => x.getField("v")).as("centroid"))

  /** Nearest-centroid assignment (the centroid classifier): every
    * vector scored against every group centroid — the centroid table is
    * groups × dims, tiny at any corpus size, so it broadcasts and the
    * scoring stage is map-only over the corpus. Ties break to the
    * highest group id via lexicographic struct max. Returns the
    * (true group, assigned group, count) confusion matrix. */
  def nearestCentroidConfusion(emb: DataFrame, idCol: String,
      groupCol: String, vecCol: String): DataFrame = {
    val cents = centroids(emb, groupCol, vecCol)
    emb.select(col(idCol).as("id"), col(groupCol).as("true_grp"),
      col(vecCol).cast("array<double>").as("vec"))
      .crossJoin(broadcast(cents))
      .select(col("id"), col("true_grp"),
        struct(VF.cosineSimilarity(col("vec"), col("centroid")).as("cos"),
          col("grp")).as("scored"))
      .groupBy(col("id"), col("true_grp"))
      .agg(max(col("scored")).as("best"))
      .groupBy(col("true_grp"), col("best.grp").as("assigned_grp"))
      .agg(count(lit(1)).as("n"))
  }
}
