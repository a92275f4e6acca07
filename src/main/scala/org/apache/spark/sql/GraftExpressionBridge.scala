package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column↔Expression conversions of
  * Spark 4's classic API (sql/core `classic.ExpressionUtils`). Spark 4
  * split Column off from catalyst Expressions for Connect; libraries
  * that register custom Catalyst expressions use a small shim in the
  * `org.apache.spark.sql` namespace — the same pattern public Spark
  * extension libraries use — to wrap/unwrap them.
  */
object GraftExpressionBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Plain-message `AnalysisException` — the public constructors in
    * Spark 4 are error-class keyed; extension libraries raising their
    * own registration/arity errors use the positional form with no
    * error class, which this wraps. */
  def analysisException(msg: String): AnalysisException =
    new AnalysisException(msg, None, None, None, None, Map.empty,
      Array.empty[org.apache.spark.QueryContext])

  /** Eagerly translate a Column's node tree into a catalyst Expression
    * (UnresolvedFunction/Literal/... nodes the analyzer then resolves).
    * `ExpressionUtils.expression` merely WRAPS the node in an opaque
    * Unevaluable leaf — fine inside Dataset transformations, but a
    * function registered via SparkSessionExtensions must return a real
    * catalyst tree or codegen dies on the wrapper. */
  def catalystExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter.apply(c.node)
}
