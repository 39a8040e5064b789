package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column <-> Expression converters — the
  * supported seam for libraries that add native Catalyst expressions
  * (Spark 4 wraps Columns around ColumnNodes, so plain user code can no
  * longer construct a Column from an Expression directly). */
object GraftSql {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Free the executor blocks behind a `localCheckpoint()`'d Dataset.
    * `Dataset.unpersist` is a no-op for local checkpoints (their blocks
    * hang off the checkpointed RDD, not the CacheManager), so iterative
    * operators that checkpoint per round would otherwise retain
    * O(rounds) copies of their state until the ContextCleaner happens to
    * GC the dropped references. No-op for non-checkpoint plans. Callers
    * must not evaluate `df` again afterwards. */
  def freeLocalCheckpoint(df: Dataset[_]): Unit =
    df.queryExecution.logical match {
      case lr: execution.LogicalRDD => lr.rdd.unpersist(blocking = false); ()
      case _ => ()
    }

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
