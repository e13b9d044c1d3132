package org.apache.spark.sql.graftext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge for graft's native Catalyst expressions.
  *
  * Spark 4 removed the public `Column(Expression)` constructor (Column
  * is now backed by ColumnNodes for Connect); the classic-session
  * conversion lives in `ExpressionUtils`, which is `private[sql]` — so
  * this one-file bridge sits under the `org.apache.spark.sql` package
  * tree. It contains no logic beyond delegation.
  */
object SqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
