package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE-compressed length of a string — the compression-ratio
  * quality signal (deflate(text).length / text.length) corpus curation
  * uses to catch pathological documents that token-level heuristics
  * miss: boilerplate floods and template spam compress far below
  * natural prose (ratio ≪ 0.4 on kilobyte-scale text), while
  * base64/hex blobs and binary-in-text sit near or above 1.0. The
  * n-gram repetition scores ([[TextFunctions]]) see LOCAL repeats;
  * deflate's LZ77 window sees every repeated substring in one pass —
  * the cheap whole-document redundancy detector.
  *
  * Why a custom Expression (SURVEY.md §7.4 preference (b)): no Spark
  * built-in exposes a compressed size, and a Scala UDF would box every
  * row and fall out of whole-stage codegen. `doGenCode` emits one
  * static call into [[DeflateUtil]], which reuses a thread-local
  * `java.util.zip.Deflater` — no per-row native-handle allocation; the
  * call runs inside the scan stage's codegen span, so the signal is
  * computed as the corpus streams by (the only shape that matters at
  * 100 TB: no shuffle, no second pass).
  *
  * Determinism: fixed level (6), nowrap — the same bytes always
  * deflate to the same length within a zlib build, and the spec pins
  * the expression against a direct `Deflater` replay plus ordering
  * properties (repetitive ≪ prose < random) that hold for ANY zlib.
  * Not DuckDB-replayable (no SQL deflate), so the lane built on this
  * is spec-pinned + bench-only, outside the oracle sweep. */
case class DeflateLen(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"deflate_len requires a string column, got $other")
    }

  override protected def nullSafeEval(s: Any): Any =
    DeflateUtil.deflatedLen(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.DeflateUtil.deflatedLen($c)")

  override def prettyName: String = "deflate_len"

  override protected def withNewChildInternal(newChild: Expression)
      : DeflateLen = copy(child = newChild)
}

/** Thread-local Deflater pool backing [[DeflateLen]] — `Deflater` holds
  * a native zlib handle; one per executor thread, `reset()` between
  * rows, never per-row allocation. */
object DeflateUtil {
  private val local = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(6, true)
  }
  private val sink = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](8192)
  }

  /** Length of deflate(utf8 bytes of s); 0 for the empty string. */
  def deflatedLen(s: UTF8String): Int = {
    val bytes = s.getBytes
    if (bytes.length == 0) return 0
    val d = local.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    var total = 0
    val buf = sink.get()
    while (!d.finished()) total += d.deflate(buf)
    total
  }
}

object CompressFunctions {
  import org.apache.spark.sql.{Column, GraftExpressionBridge => B}
  import org.apache.spark.sql.functions._

  def deflateLen(c: Column): Column =
    B.column(DeflateLen(B.catalystExpression(c)))

  /** deflate(text).length / octet_length(text); empty text → 1.0
    * (incompressible by convention — never flagged). */
  def compressRatio(c: Column): Column = {
    val n = octet_length(c)
    when(n === 0, lit(1.0))
      .otherwise(deflateLen(c).cast("double") / n.cast("double"))
  }
}
