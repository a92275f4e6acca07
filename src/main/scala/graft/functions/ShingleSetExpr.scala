package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `distinct_shingles(tokens, n)`: the DISTINCT word n-gram set of a
  * token array, first-occurrence order — semantically identical to
  * `array_distinct(transform(sequence(...), i => concat_ws(" ",
  * slice(toks, i, n))))` plus the short-input special cases, but ONE
  * imperative eval per row instead of an interpreted lambda round-trip
  * per position (higher-order array functions are CodegenFallback in
  * Spark, and their per-ELEMENT interpretation is what costs; a
  * per-ROW fallback that streams the windows in a tight loop is the
  * same trade [[NGramExplode]] makes).
  *
  * Special cases, matching [[TextFunctions.shinglesFromTokens]]:
  * empty token array → empty set; fewer than n tokens → one shingle of
  * the whole document.
  */
case class DistinctShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (n < 1) {
      TypeCheckResult.TypeCheckFailure(s"n must be >= 1, got $n")
    } else {
      child.dataType match {
        case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"distinct_shingles requires array<string>, got $other")
      }
    }

  override protected def nullSafeEval(toks: Any): Any = {
    val arr = toks.asInstanceOf[ArrayData]
    val len = arr.numElements()
    if (len == 0) return new GenericArrayData(Array.empty[Any])
    val sep = UTF8String.fromString(" ")
    if (len <= n) {
      val whole = UTF8String.concatWs(sep,
        (0 until len).map(arr.getUTF8String): _*)
      return new GenericArrayData(Array[Any](whole))
    }
    // LinkedHashSet: distinct with first-occurrence order, the
    // array_distinct contract
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    val last = len - n
    while (i <= last) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = arr.getUTF8String(i + j); j += 1 }
      seen.add(UTF8String.concatWs(sep, parts: _*))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  override def prettyName: String = "distinct_shingles"

  override protected def withNewChildInternal(newChild: Expression)
      : DistinctShingles = copy(child = newChild)
}

/** Column-API entry point for [[DistinctShingles]]. */
object ShingleFunctions {
  import org.apache.spark.sql.{Column, GraftExpressionBridge => B}

  def distinctShingles(toks: Column, n: Int): Column =
    B.column(DistinctShingles(B.catalystExpression(toks), n))
}
