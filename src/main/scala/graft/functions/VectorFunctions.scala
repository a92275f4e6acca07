package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector primitives over `array<float>` embedding columns,
  * expressed entirely with codegen'd higher-order array functions
  * (`zip_with` + `aggregate`) — no UDF, no driver-side math, so the same
  * expressions run inside whole-stage codegen on every executor.
  *
  * All math is done in double: per-element double products are
  * bit-identical across engines (DuckDB oracle casts its lists to
  * DOUBLE[] the same way), and the sequential left-fold of `aggregate`
  * fixes the association order.
  */
object VectorFunctions {

  /** Cast an array<float> column to array<double> for stable math. */
  def asDouble(v: Column): Column = v.cast("array<double>")

  /** Sequential-fold dot product of two equal-length vectors. */
  def dotProduct(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  /** Euclidean (L2) norm. */
  def l2Norm(v: Column): Column = sqrt(dotProduct(v, v))

  /** Cosine similarity via the native codegen'd Catalyst expression
    * ([[CosineSimilarityExpr]]): one fused loop for dot + norms, no
    * per-row allocation, whole-stage-codegen friendly. Bit-identical to
    * [[cosineSimilarityHof]]. */
  def cosineSimilarity(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftExpressionBridge._
    column(CosineSimilarityExpr(expression(a), expression(b)))
  }

  /** Cosine similarity composed from built-in higher-order functions —
    * the declarative reference form (interpreted lambdas; kept for
    * cross-checking the native expression). */
  def cosineSimilarityHof(a: Column, b: Column): Column = {
    val denom = l2Norm(a) * l2Norm(b)
    when(denom === 0.0, lit(0.0)).otherwise(dotProduct(a, b) / denom)
  }

  /** Squared L2 distance (monotone with L2 — cheaper for ranking). */
  def l2DistanceSq(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  /** Random-hyperplane LSH bucket id: `planes` sign bits assembled into
    * an int. Plane p's component for dimension d is a deterministic
    * pseudo-random ±1 derived from xxhash64(planeOffset+p, d) — no
    * stored model, any executor recomputes the same hyperplanes, which
    * is what makes this usable as a shuffle key at 100 TB. `planeOffset`
    * selects an independent hyperplane family per LSH table.
    */
  def hyperplaneBucket(v: Column, planes: Int, planeOffset: Int = 0): Column = {
    val vd = asDouble(v)
    val bits = (0 until planes).map { p =>
      val proj = aggregate(
        zip_with(vd, sequence(lit(0), size(vd) - 1), (x, d) =>
          x * (xxhash64(lit(planeOffset + p), d).bitwiseAND(1) * 2 - 1)
            .cast("double")),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0.0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ bitwiseOR _).cast("int")
  }

  /** (table, bucket) pairs across `tables` independent hyperplane
    * families — the multi-table LSH index entries for one vector. */
  def lshTableBuckets(v: Column, planes: Int, tables: Int): Column =
    array((0 until tables).map { t =>
      struct(lit(t).as("tbl"),
        hyperplaneBucket(v, planes, t * planes).as("bkt"))
    }: _*)
}
