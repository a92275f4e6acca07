package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketized range join — the scalable form of an interval/proximity
  * predicate join (guide's "range join" custom-operator family; absent
  * from the reference, which only has equi-joins).
  *
  * A naive `|t_a - t_b| ≤ tol` self-join is a per-key cross product
  * (BroadcastNestedLoopJoin at best). Bucketizing event time into
  * tolerance-width buckets turns it into an EQUI-join on (key, bucket):
  * each probe row offers its own and both adjacent buckets, the
  * residual predicate filters exact distance, and id ordering +
  * distinct canonicalize pairs. Shuffle key = (key, bucket) → bounded
  * pair counts per bucket at any scale; this is the same trick as the
  * LSH band join and the IVF cell join.
  *
  * The probe must cover BOTH adjacent buckets, not just {b, b+1}: the
  * id order that canonicalizes pairs (id_a < id_b) is independent of
  * time order, so the qualifying neighbour of a probe row can sit in
  * the bucket below it (smaller id, later timestamp). With only
  * {b, b+1} that pair is found in neither orientation — the probe
  * never offers b−1, and the reversed roles fail the id filter.
  */
object RangeJoin {

  /** Pairs of rows (id_a < id_b) sharing `keyCol` whose `tsCol` values
    * lie within `tolSec` seconds of each other. `dt_us` = t_b − t_a
    * (negative when the larger id is earlier in time). */
  def timeProximityPairs(df: DataFrame, idCol: String, keyCol: String,
      tsCol: String, tolSec: Long): DataFrame = {
    val tolUs = tolSec * 1000000L
    val base = df.select(
      col(keyCol).as("k"), col(idCol).as("id"),
      unix_micros(col(tsCol)).as("t"))
      .withColumn("b", floor(col("t") / tolUs))
    val probe = base
      .withColumn("jb", explode(array(col("b") - 1, col("b"), col("b") + 1)))
      .select(col("k"), col("id").as("id_a"), col("t").as("t_a"), col("jb"))
    probe.join(base.select(col("k"), col("id").as("id_b"),
        col("t").as("t_b"), col("b").as("jb")), Seq("k", "jb"))
      .filter(col("id_a") < col("id_b") &&
        abs(col("t_a") - col("t_b")) <= tolUs)
      .select(col("id_a"), col("id_b"),
        (col("t_b") - col("t_a")).as("dt_us"))
      .distinct()
  }
}
