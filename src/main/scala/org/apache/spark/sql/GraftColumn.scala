package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the sql-private Column/Expression conversions (Spark 4 hides
  * them behind the Connect column-node layer) — the same in-package shim
  * pattern OSS Spark extension libraries use to expose native Catalyst
  * Expressions as Columns. */
object GraftColumn {
  def of(e: Expression): Column = classic.ExpressionUtils.column(e)
  def exprOf(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Register a function into a live session's registry (sessionState is
    * sql-private; the extensions path only runs at session build time). */
  def registerFunction(spark: SparkSession,
      id: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .registerFunction(id, info, builder)
}
