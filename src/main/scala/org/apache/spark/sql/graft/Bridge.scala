package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression conversion lives behind `private[sql]` in
  * Spark 4 (`classic.ExpressionUtils`), so this one-file package
  * bridge re-exports it for graft's native Catalyst expressions
  * ([[graft.functions.VectorKernels]]). No other private API is
  * touched. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
