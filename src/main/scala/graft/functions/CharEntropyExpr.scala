package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shannon entropy (bits per char) of a string's character
  * distribution — the third axis of the redundancy-detection family
  * next to n-gram repetition ([[TextFunctions]], local repeats) and
  * deflate ratio ([[DeflateLen]], global repeats): character entropy is
  * the DISTRIBUTIONAL signal. Natural English prose sits near 4.1–4.4
  * bits; single-char floods and whitespace walls fall under 1; random
  * base64/hex blobs push toward log2(64)=6. Corpus curation uses the
  * band cut both ways (too low = degenerate, too high = binary-in-text).
  *
  * Why a custom Expression (SURVEY.md §7.4 preference (b)): computing a
  * per-row histogram declaratively means split→explode→two groupBys —
  * a shuffle of every character in the corpus, catastrophic at 100 TB.
  * Here the histogram lives in one int[] for the one row being scanned;
  * `doGenCode` emits a static call into [[CharEntropyUtil]] so the
  * whole computation stays inside the scan stage's codegen span and the
  * corpus is never reshaped — read speed, no shuffle, no second pass.
  *
  * Exact form (H = log2(n) - Σ c·log2(c) / n, integer counts c): the
  * DuckDB oracle replays the identical formula over an unnest-histogram,
  * and the two engines' double sums agree to well past the 4 decimals
  * the lane rounds to (terms are ≤ n·log2(n) ≈ 5k for 553-char docs;
  * double error ~1e-12).
  *
  * Counts are per UTF-16 code unit. For the ASCII corpus this equals
  * DuckDB's per-character split; supplementary-plane text would count
  * surrogates separately (documented, deterministic — not a hash of
  * platform state).
  */
case class CharEntropy(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"char_entropy requires a string column, got $other")
    }

  override protected def nullSafeEval(s: Any): Any =
    CharEntropyUtil.entropyBits(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CharEntropyUtil.entropyBits($c)")

  override def prettyName: String = "char_entropy"

  override protected def withNewChildInternal(newChild: Expression)
      : CharEntropy = copy(child = newChild)
}

object CharEntropyUtil {
  private val LOG2 = math.log(2.0)

  // Latin-1 fast path: one flat 256-slot histogram covers the whole
  // corpus; anything above falls into a small open-addressed overflow
  // map allocated per call only when such a char actually occurs.
  private val local = new ThreadLocal[Array[Int]] {
    override def initialValue(): Array[Int] = new Array[Int](256)
  }

  /** H in bits per UTF-16 code unit; 0.0 for the empty string. */
  def entropyBits(s: UTF8String): Double = {
    val str = s.toString
    val n = str.length
    if (n == 0) return 0.0
    val hist = local.get()
    java.util.Arrays.fill(hist, 0)
    var overflow: java.util.HashMap[Character, Array[Int]] = null
    var i = 0
    while (i < n) {
      val c = str.charAt(i)
      if (c < 256) hist(c) += 1
      else {
        if (overflow == null) overflow = new java.util.HashMap
        val cell = overflow.computeIfAbsent(c, _ => new Array[Int](1))
        cell(0) += 1
      }
      i += 1
    }
    var acc = 0.0
    i = 0
    while (i < 256) {
      val c = hist(i)
      if (c > 0) acc += c * (math.log(c.toDouble) / LOG2)
      i += 1
    }
    if (overflow != null) {
      val it = overflow.values().iterator()
      while (it.hasNext) {
        val c = it.next()(0)
        acc += c * (math.log(c.toDouble) / LOG2)
      }
    }
    math.log(n.toDouble) / LOG2 - acc / n
  }
}

object EntropyFunctions {
  import org.apache.spark.sql.{Column, GraftExpressionBridge => B}

  def charEntropy(c: Column): Column =
    B.column(CharEntropy(B.catalystExpression(c)))
}
