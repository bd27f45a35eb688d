package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 gates `ExpressionUtils` behind
  * `private[sql]`, so this one-file shim lives in the `org.apache.spark.sql`
  * namespace — the standard pattern for libraries that ship custom Catalyst
  * expressions (no Spark internals are modified or shadowed).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
