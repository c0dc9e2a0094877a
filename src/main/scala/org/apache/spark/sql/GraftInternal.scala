package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to `private[sql]` Column↔Expression converters, so graft's
  * native Catalyst expressions can surface as Columns without going
  * through the string SQL parser. Lives in the spark.sql package for
  * visibility only; contains no logic.
  */
object GraftInternal {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Free the block-manager storage behind a `localCheckpoint`ed
    * Dataset. `Dataset.unpersist` only knows CacheManager entries, so
    * checkpoint blocks otherwise live until the RDD is GC'd; iterative
    * operators (connected components) call this to drop each round's
    * blocks as soon as the next round is materialized. No-op for plans
    * that aren't RDD-backed. */
  def unpersistBackingRdd(df: Dataset[_]): Unit =
    df.queryExecution.logical match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Block until the async listener bus has delivered every queued
    * event (QueryExecutionListener callbacks included). Specs that
    * assert on listener-observed action counts use this instead of a
    * polled sleep, which can elapse on a stalled host before delivery. */
  def waitForListeners(spark: SparkSession, timeoutMs: Long = 60000L): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty(timeoutMs)
}
