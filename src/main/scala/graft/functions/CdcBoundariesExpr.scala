package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `cdc_boundaries(s, window, divisor)`: the 1-based END positions of
  * every content-defined chunk boundary of `s` — positions `p` where
  * the polynomial hash of the trailing `window`-char window
  * Σ c_i · B^(W−1−i) mod M satisfies `hash mod divisor == 0`, plus the
  * final position so chunks tile the document; a document shorter than
  * `window` is one chunk `[n]`.
  *
  * Semantically identical to the explode-of-positions form in
  * [[graft.operators.ContentChunker.chunksViaExplode]] (which pays an
  * n-row fan-out per document plus 8 `element_at` calls per position),
  * but ONE imperative eval per row: a rolling-hash byte loop — remove
  * the leading term, shift by B, add the new char — at 3 modular ops
  * per character, emitting only the ~n/divisor boundary ends. This is
  * the same interpreted-HOF trade as [[DistinctShingles]] /
  * [[RollingHash]]: a per-ROW CodegenFallback beats per-ELEMENT plan
  * arithmetic by orders of magnitude.
  *
  * Contract (same as [[RollingHash]]): `s` is NORMALIZED text
  * ([a-z0-9 ] — single-byte ASCII), so byte iteration equals the
  * oracle's per-character `ascii()` exactly and every boundary replays
  * in DuckDB value for value. Empty input yields an empty array (the
  * operator filters empty docs before chunking).
  */
case class CdcBoundaries(child: Expression, window: Int, divisor: Long)
    extends UnaryExpression with CodegenFallback {

  private val B = graft.operators.ContentChunker.B
  private val M = graft.operators.ContentChunker.M

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (window < 2 || window > 16) {
      TypeCheckResult.TypeCheckFailure(
        s"window must be in [2,16], got $window")
    } else if (divisor < 2) {
      TypeCheckResult.TypeCheckFailure(s"divisor must be >= 2, got $divisor")
    } else {
      child.dataType match {
        case _: StringType => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"cdc_boundaries requires a string column, got $other")
      }
    }

  override protected def nullSafeEval(s: Any): Any = {
    val bytes = s.asInstanceOf[UTF8String].getBytes
    val n = bytes.length
    if (n == 0) return new GenericArrayData(Array.empty[Long])
    if (n < window) return new GenericArrayData(Array(n.toLong))
    // powHi = B^(W−1): the weight of the window's leading character.
    var powHi = 1L
    var i = 1
    while (i < window) { powHi = powHi * B % M; i += 1 }
    // Initial window hash for p = window (bytes 0 .. W−1).
    var h = 0L
    i = 0
    while (i < window) { h = (h * B + (bytes(i) & 0xffL)) % M; i += 1 }
    val out = new java.util.ArrayList[Long]()
    var p = window
    while (p <= n) {
      if (p == n || h % divisor == 0L) out.add(p.toLong)
      if (p < n) {
        // Roll bytes[p−W .. p−1] → bytes[p−W+1 .. p]. Products stay
        // ≤ 255·(M−1) and (h+M)·B ≤ 2M·257 — no Long overflow.
        val drop = (bytes(p - window) & 0xffL) * powHi % M
        h = ((h + M - drop) % M * B + (bytes(p) & 0xffL)) % M
      }
      p += 1
    }
    val arr = new Array[Long](out.size)
    i = 0
    while (i < arr.length) { arr(i) = out.get(i); i += 1 }
    new GenericArrayData(arr)
  }

  override def prettyName: String = "cdc_boundaries"

  override protected def withNewChildInternal(newChild: Expression)
      : CdcBoundaries = copy(child = newChild)
}

/** Column-API entry point for [[CdcBoundaries]]. */
object CdcFunctions {
  import org.apache.spark.sql.{Column, GraftExpressionBridge => B}

  def cdcBoundaries(s: Column, window: Int, divisor: Long): Column =
    B.column(CdcBoundaries(B.catalystExpression(s), window, divisor))
}
