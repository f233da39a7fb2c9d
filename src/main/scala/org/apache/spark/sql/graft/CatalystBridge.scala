package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` Column↔Expression conversion (Spark 4 moved
  * the classic `new Column(expr)` constructor behind
  * `org.apache.spark.sql.classic.ExpressionUtils`). Lives in the
  * `org.apache.spark.sql` package space solely to satisfy the access
  * modifier; keep it to these two forwarders.
  */
object CatalystBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
