package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Imperative token-list scorers — the [[DistinctShingles]] trade
  * applied to the stopword surface: Spark's higher-order `filter`
  * lambda with an `isin(40 literals)` predicate is interpreted per
  * ELEMENT (and the language-ID argmax evaluated it once per language,
  * re-tokenizing each time); one per-ROW eval with hash-set membership
  * does the same work in a tight loop. Semantics are bit-identical to
  * the declarative forms they replace, so every oracle replays
  * unchanged. */
object StopwordExprs {
  private[functions] def toSet(words: Seq[String]): java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  private[functions] def requireStringArray(e: Expression,
      name: String): TypeCheckResult =
    e.dataType match {
      case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$name requires array<string>, got $other")
    }
}

/** `token_set_count(toks, words)`: how many elements of `toks` (with
  * multiplicity) are in `words` — ≡ `size(filter(toks, isin(words)))`. */
case class TokenSetCount(child: Expression, words: Seq[String])
    extends UnaryExpression with CodegenFallback {

  private lazy val set = StopwordExprs.toSet(words)

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (words.isEmpty) {
      TypeCheckResult.TypeCheckFailure("word list must be non-empty")
    } else StopwordExprs.requireStringArray(child, prettyName)

  override protected def nullSafeEval(toks: Any): Any = {
    val arr = toks.asInstanceOf[ArrayData]
    var hits = 0L
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (set.contains(arr.getUTF8String(i))) hits += 1
      i += 1
    }
    hits
  }

  override def prettyName: String = "token_set_count"

  override protected def withNewChildInternal(newChild: Expression)
      : TokenSetCount = copy(child = newChild)
}

/** `best_stopword_lang(toks, profiles)`: the language whose stopword
  * list scores the most hits over `toks`, ONE pass — ≡
  * `greatest(struct(hits_l, lit(l)) for l)` with its lexicographic
  * (hits, lang) tie-break (equal hits → later-sorting language name),
  * and "und" when nothing matches. The declarative form re-tokenized
  * and re-filtered once per language. */
case class BestStopwordLang(child: Expression,
    profiles: Seq[(String, Seq[String])])
    extends UnaryExpression with CodegenFallback {

  private lazy val sets: Array[(UTF8String, java.util.HashSet[UTF8String])] =
    profiles.map { case (l, ws) =>
      (UTF8String.fromString(l), StopwordExprs.toSet(ws))
    }.toArray

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (profiles.isEmpty || profiles.exists(_._2.isEmpty)) {
      TypeCheckResult.TypeCheckFailure("profiles must be non-empty")
    } else StopwordExprs.requireStringArray(child, prettyName)

  private val und = UTF8String.fromString("und")

  override protected def nullSafeEval(toks: Any): Any = {
    val arr = toks.asInstanceOf[ArrayData]
    val hits = new Array[Long](sets.length)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val t = arr.getUTF8String(i)
      var l = 0
      while (l < sets.length) {
        if (sets(l)._2.contains(t)) hits(l) += 1
        l += 1
      }
      i += 1
    }
    var best = 0
    var l = 1
    while (l < sets.length) {
      // (hits, lang) lexicographic max — the greatest(struct(...)) order
      if (hits(l) > hits(best) ||
        (hits(l) == hits(best) && sets(l)._1.compareTo(sets(best)._1) > 0))
        best = l
      l += 1
    }
    if (hits(best) == 0L) und else sets(best)._1
  }

  override def prettyName: String = "best_stopword_lang"

  override protected def withNewChildInternal(newChild: Expression)
      : BestStopwordLang = copy(child = newChild)
}

/** Column-API entry points. */
object StopwordFunctions {
  import org.apache.spark.sql.{Column, GraftExpressionBridge => B}

  def tokenSetCount(toks: Column, words: Seq[String]): Column =
    B.column(TokenSetCount(B.catalystExpression(toks), words))

  def bestStopwordLang(toks: Column,
      profiles: Seq[(String, Seq[String])]): Column =
    B.column(BestStopwordLang(B.catalystExpression(toks), profiles))
}
