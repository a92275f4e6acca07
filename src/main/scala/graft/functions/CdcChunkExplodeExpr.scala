package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `cdc_chunk_explode(s, window, divisor)`: one row per content-defined
  * chunk of `s` — (chunk_idx, start, len, chunk), 1-based char spans,
  * `chunk` the text slice itself. A boundary fires where the polynomial
  * hash of the trailing `window`-char window Σ c_i · B^(W−1−i) mod M
  * satisfies `hash mod divisor == 0`; the final position always ends a
  * chunk so chunks tile the document; input shorter than `window` is
  * one whole-document chunk. Empty input generates zero rows (explode
  * semantics).
  *
  * Why a GENERATOR and not a boundary-array column: emitting positions
  * and slicing with per-chunk `substring(t, start, len)` has two costs
  * that dominate at scale — the explode carries the FULL document text
  * into every chunk row (≈ doc_len/divisor × doc_len bytes of copying
  * per document), and each `substring` re-scans the UTF8String from
  * the start to find its char offset (O(start) each → O(n²/divisor)
  * per document). One byte pass computes the rolling hash (3 modular
  * ops per character) AND slices each chunk as it closes, so a chunk
  * row carries only its own ~divisor-byte slice and the whole operator
  * is O(n) per document.
  *
  * Contract (same as [[RollingHash]]): `s` is NORMALIZED text
  * ([a-z0-9 ] — single-byte ASCII), so byte offsets equal char offsets
  * and every boundary, span, and chunk replays in the DuckDB oracle's
  * per-character `ascii()` arithmetic value for value.
  */
case class CdcChunkExplode(child: Expression, window: Int, divisor: Long)
    extends UnaryExpression with Generator with CodegenFallback {

  private val B = graft.operators.ContentChunker.B
  private val M = graft.operators.ContentChunker.M

  override def elementSchema: StructType = StructType(Seq(
    StructField("chunk_idx", LongType, nullable = false),
    StructField("start", LongType, nullable = false),
    StructField("len", LongType, nullable = false),
    StructField("chunk", StringType, nullable = false)))

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
          s"cdc_chunk_explode requires a string column, got $other")
      }
    }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input)
    if (t == null) return Nil
    val bytes = t.asInstanceOf[UTF8String].getBytes
    val n = bytes.length
    if (n == 0) return Nil
    if (n < window) {
      return Iterator.single(InternalRow(1L, 1L, n.toLong,
        UTF8String.fromBytes(bytes, 0, n)))
    }
    // powHi = B^(W−1): the weight of the window's leading character.
    var powHi = 1L
    var i = 1
    while (i < window) { powHi = powHi * B % M; i += 1 }
    // Initial window hash for p = window (bytes 0 .. W−1).
    var h0 = 0L
    i = 0
    while (i < window) { h0 = (h0 * B + (bytes(i) & 0xffL)) % M; i += 1 }

    new Iterator[InternalRow] {
      private var h = h0
      private var p = window // candidate end position, 1-based
      private var prev = 0L  // end of the last emitted chunk
      private var idx = 0L

      override def hasNext: Boolean = prev < n

      override def next(): InternalRow = {
        // advance p to the next boundary (or the final position)
        while (p < n && h % divisor != 0L) {
          // Roll bytes[p−W .. p−1] → bytes[p−W+1 .. p]. Products stay
          // ≤ 255·(M−1) and (h+M)·B ≤ 2M·257 — no Long overflow.
          val drop = (bytes(p - window) & 0xffL) * powHi % M
          h = ((h + M - drop) % M * B + (bytes(p) & 0xffL)) % M
          p += 1
        }
        val end = p.toLong
        idx += 1
        val row = InternalRow(idx, prev + 1L, end - prev,
          UTF8String.fromBytes(bytes, prev.toInt, (end - prev).toInt))
        prev = end
        if (p < n) { // step past this boundary before the next scan
          val drop = (bytes(p - window) & 0xffL) * powHi % M
          h = ((h + M - drop) % M * B + (bytes(p) & 0xffL)) % M
          p += 1
        }
        row
      }
    }
  }

  override def prettyName: String = "cdc_chunk_explode"

  override protected def withNewChildInternal(newChild: Expression)
      : CdcChunkExplode = copy(child = newChild)
}

/** Column-API entry point for [[CdcChunkExplode]]. */
object CdcFunctions {
  import org.apache.spark.sql.{Column, GraftExpressionBridge => B}

  /** One row per CDC chunk: struct(chunk_idx, start, len, chunk). Use
    * in `select` like `explode`. */
  def cdcChunkExplode(s: Column, window: Int, divisor: Long): Column =
    B.column(CdcChunkExplode(B.catalystExpression(s), window, divisor))
}
