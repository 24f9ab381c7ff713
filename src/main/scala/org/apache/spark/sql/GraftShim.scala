package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between graft's custom Catalyst expressions and the public
  * `Column` API. `org.apache.spark.sql.classic.ExpressionUtils` is
  * `private[sql]` in Spark 4.x, so the conversion is exposed from inside the
  * `org.apache.spark.sql` package. This is the only file outside the `graft`
  * namespace and contains no logic of its own.
  */
object GraftShim {
  /** Wrap a Catalyst expression as a user-facing Column. */
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** Unwrap a Column to its underlying Catalyst expression. */
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Register a SQL function on a LIVE session (sessionState is
    * `private[sql]`; this is the sanctioned post-creation path for a
    * library installing its functions without a session restart).
    */
  def registerFunction(
      spark: SparkSession,
      name: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(name, info, builder)

  /** Number of RDD storage blocks still registered with the block manager
    * — after a GC these are `localCheckpoint` blocks the ContextCleaner
    * has queued but not yet released. `BlockManager` is `private[spark]`,
    * so the count is exposed from here; Bench's between-pass settle drains
    * on it so async block drops never land inside a timed pass.
    */
  def pendingRddBlocks(): Int =
    org.apache.spark.SparkEnv.get.blockManager.master
      .getMatchingBlockIds(_.isRDD, askStorageEndpoints = true).size
}
