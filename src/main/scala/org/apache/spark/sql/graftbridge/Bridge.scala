package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public `new Column(Expression)` constructor; Column now
  * wraps a ColumnNode. This bridge lives under `org.apache.spark.sql` so it can
  * reach the `private[sql]` converter — the same trick the reference needs for
  * its adapter (reference: scala/.../adapters/Column.scala:6-10).
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def aggColumn(a: AggregateFunction): Column =
    ExpressionUtils.column(a.toAggregateExpression())
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a SQL function on a LIVE session (`sessionState` is `private[sql]`;
    * cluster deployments use `spark.sql.extensions=graft.GraftExtensions` instead,
    * which needs no bridge).
    */
  def registerFunction(
      spark: org.apache.spark.sql.SparkSession,
      name: String,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier(name), info, builder)
}
