package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column <-> Expression converters — the
  * supported seam for libraries that add native Catalyst expressions
  * (Spark 4 wraps Columns around ColumnNodes, so plain user code can no
  * longer construct a Column from an Expression directly). */
object GraftSql {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Register function builders into a live session's FunctionRegistry
    * (the post-construction twin of SparkSessionExtensions.injectFunction). */
  def registerFunctions(
      spark: SparkSession,
      fns: Seq[(catalyst.FunctionIdentifier,
        catalyst.expressions.ExpressionInfo,
        Seq[Expression] => Expression)]): Unit =
    fns.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
