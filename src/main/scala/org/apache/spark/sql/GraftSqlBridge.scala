package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/**
 * Bridge to the `private[sql]` Column ↔ Expression converters, so graft's
 * custom Catalyst expressions (graft.expressions.*) can be exposed through
 * the public Column API without registering session extensions. Standard
 * pattern for Spark extension libraries.
 */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Register a function into a LIVE session's registry (the extensions
    * path only applies at session build time). */
  def registerFunction(spark: SparkSession, name: String,
                       info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
                       builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      new org.apache.spark.sql.catalyst.FunctionIdentifier(name), info, builder)
}
