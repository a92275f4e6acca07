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
}
