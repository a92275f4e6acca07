package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst GENERATOR — the table-function (UDTF) tier of the
  * extension surface, completing the matrix beside the scalar
  * expression ([[CosineSimilarityExpr]]), the imperative aggregates
  * ([[HeavyHittersAgg]], [[CountMinAgg]]), the optimizer rule
  * ([[graft.plans.ProximityJoinRewrite]]), and the whole-operator plan
  * ([[graft.plans.AsOfJoinNative]]).
  *
  * `NGramExplode(text, n)` emits one row per word n-gram of the
  * whitespace-tokenized input: (pos, ngram), 1-based positions. It is
  * the operator form of the `explode(transform(sequence(...)))`
  * pipeline used across the dedup lanes — with two scale advantages:
  * the token array and the n-gram array are never MATERIALIZED as
  * columns (the iterator streams windows straight out of one tokenize
  * pass), and Spark plans it as a `GenerateExec` stage that pipelines
  * into the parent scan — no higher-order-function interpretation per
  * element.
  *
  * Null/short inputs generate zero rows (explode semantics — callers
  * wanting outer semantics wrap in `generatorOuter`).
  */
case class NGramExplode(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("ngram", StringType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (n < 1) {
      TypeCheckResult.TypeCheckFailure(s"n must be >= 1, got $n")
    } else {
      child.dataType match {
        case _: StringType => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"ngram_explode requires a string column, got $other")
      }
    }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input)
    if (t == null) {
      Nil
    } else {
      val toks = t.asInstanceOf[UTF8String].toString.trim
        .split("\\s+").filter(_.nonEmpty)
      if (toks.length < n) {
        Nil
      } else {
        // stream the windows: one InternalRow per n-gram, no
        // intermediate array-of-ngrams allocation
        (0 to toks.length - n).iterator.map { i =>
          InternalRow(i + 1,
            UTF8String.fromString(toks.slice(i, i + n).mkString(" ")))
        }
      }
    }
  }

  override def prettyName: String = "ngram_explode"

  override protected def withNewChildInternal(newChild: Expression)
      : NGramExplode = copy(child = newChild)
}

/** Column-API entry points for [[NGramExplode]]. */
object NGramFunctions {
  import org.apache.spark.sql.{Column, GraftExpressionBridge => B}

  /** One row per word n-gram: struct(pos, ngram). Use in `select` like
    * `explode`: `df.select(col("id"), ngramExplode(col("text"), 3))`. */
  def ngramExplode(text: Column, n: Int): Column =
    B.column(NGramExplode(B.catalystExpression(text), n))
}
