package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fuzzy record linkage: match noisy strings (typos, truncations,
  * suffix junk) to a canonical table under an edit-distance bound —
  * the entity-resolution step of metadata cleanup pipelines.
  *
  * Scale shape: edit distance admits no hash join directly, and the
  * naive form is a cartesian product. Length blocking restores an
  * equi-join: `levenshtein(a, b) >= |len(a) − len(b)|`, so for
  * `dist <= maxDist` the two lengths land in the same or adjacent
  * length buckets whenever `blockWidth > maxDist` — the probe side
  * explodes to buckets {b−1, b, b+1} (3× the PROBE, never the base),
  * the join is a plain hash equi-join on the bucket, and the
  * levenshtein runs only on candidates (same pattern as
  * [[RangeJoin]]'s tolerance buckets). Blocking is LOSSLESS: no pair
  * within `maxDist` can be missed, which the oracle's unblocked join
  * verifies. */
object FuzzyJoin {

  /** Best match per probe row: minimum edit distance within `maxDist`,
    * ties broken by minimum base id. Probes with no candidate drop out
    * (inner semantics — callers left-join back for miss reporting). */
  def bestMatch(probe: DataFrame, probeId: String, probeText: String,
      base: DataFrame, baseId: String, baseText: String,
      maxDist: Int, blockWidth: Int): DataFrame = {
    require(blockWidth > maxDist,
      s"blockWidth ($blockWidth) must exceed maxDist ($maxDist) for " +
        "adjacent-bucket blocking to be lossless")
    val pb = probe
      .select(col(probeId).as("probe_id"), col(probeText).as("q"),
        floor(length(col(probeText)) / blockWidth).as("b0"))
      .select(col("probe_id"), col("q"),
        explode(array(col("b0") - 1, col("b0"), col("b0") + 1)).as("blk"))
    val bs = base.select(col(baseId).as("base_id"),
      col(baseText).as("base_name"),
      floor(length(col(baseText)) / blockWidth).as("blk"))
    val cand = pb.join(bs, "blk")
      .withColumn("dist", levenshtein(col("q"), col("base_name")))
      .filter(col("dist") <= maxDist)
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("dist").asc, col("base_id").asc)
    cand.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("probe_id"), col("q"), col("base_id"),
        col("base_name"), col("dist").cast("long").as("dist"))
  }
}
