package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's `private[sql]` Column ⇄ Catalyst Expression converters,
  * so graft's native expressions ([[graft.plans.TextHashing]],
  * [[graft.plans.CosineSimilarity]]) can be used as plain `Column`s without
  * per-session function registration. Lives under `org.apache.spark.sql` for
  * visibility only — the usual pattern for Spark-native extension libraries.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
