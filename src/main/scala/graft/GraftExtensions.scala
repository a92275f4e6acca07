package graft

import graft.functions.CosineSimilarityExpr
import org.apache.spark.sql.SparkSessionExtensions

/** SparkSessionExtensions entry point (SURVEY.md §7.4 preference order
  * (c) registration path): injects the engine's custom Catalyst
  * expressions into the SQL function registry so pure-SQL users get them
  * too:
  *
  * {{{
  * val spark = SparkSession.builder()
  *   .withExtensions(new GraftExtensions)...
  * spark.sql("SELECT cosine_similarity(a.embedding, b.embedding) ...")
  * }}}
  *
  * Also usable via `spark.sql.extensions=graft.GraftExtensions` on a
  * cluster, which is how a 1000-executor deployment would pick these up
  * without code changes.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("cosine_similarity"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[CosineSimilarityExpr].getCanonicalName,
          "cosine_similarity"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          CosineSimilarityExpr(exprs(0), exprs(1))))
  }
}
