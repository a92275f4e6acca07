package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `rolling_hash(s)`: Karp-Rabin polynomial fingerprint
  * h = fold(h·31 + code) mod 1e9+7 over the characters of `s` — ≡ the
  * `aggregate(split(s, ""), …)` fold it replaces (which, despite being
  * built from built-ins, evaluated INTERPRETED per character — the
  * same higher-order-function cost as the shingle/stopword lambdas,
  * paid once per char of every document).
  *
  * Contract: `s` is NORMALIZED text ([a-z0-9 ] — all single-byte
  * ASCII), so byte iteration and per-character `ascii()` agree
  * exactly and the DuckDB oracle's replay of the same fold matches
  * value for value. Empty input hashes to 0 (the fold's seed over the
  * empty split). */
case class RollingHash(child: Expression)
    extends UnaryExpression with CodegenFallback {

  private val M = 1000000007L

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"rolling_hash requires a string column, got $other")
    }

  override protected def nullSafeEval(s: Any): Any = {
    val bytes = s.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * 31L + (bytes(i) & 0xffL)) % M
      i += 1
    }
    h
  }

  override def prettyName: String = "rolling_hash"

  override protected def withNewChildInternal(newChild: Expression)
      : RollingHash = copy(child = newChild)
}

object RollingHashFunctions {
  import org.apache.spark.sql.{Column, GraftExpressionBridge => B}

  def rollingHash(s: Column): Column =
    B.column(RollingHash(B.catalystExpression(s)))
}
