package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between graft's custom Catalyst expressions and the public Column
  * API. Spark 4 removed `new Column(expr)`; the supported internal path is
  * `classic.ExpressionUtils`, which is `private[sql]` — hence this one-file
  * shim living in the `org.apache.spark.sql` package (the conventional
  * pattern for Spark extension libraries).
  */
object GraftExpressionBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
