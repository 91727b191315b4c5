package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Narrow access bridge: Spark 4 hides Column↔Expression conversion behind
  * `private[sql]` (classic.ExpressionUtils). Graft's native expressions
  * (e.g. [[graft.functions.BloomMightContain]]) need exactly these two
  * calls to surface as Columns without going through the SQL function
  * registry, so this object lives in the sql package namespace and
  * re-exports them — nothing else.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
