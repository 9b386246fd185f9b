package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge for turning a raw Catalyst [[Expression]] into a user-facing
  * [[Column]]. Spark 4 removed the public `new Column(expr)`
  * constructor; the supported conversion lives in
  * `org.apache.spark.sql.classic.ExpressionUtils` which is
  * `private[sql]`, so this one-liner lives under the spark.sql package —
  * the standard pattern used by third-party Spark extension libraries.
  */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
