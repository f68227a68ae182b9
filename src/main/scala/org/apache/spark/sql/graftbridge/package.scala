package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to Spark 4's `private[sql]` Column ↔ Expression converters.
  * Spark 4 rebased `Column` on ColumnNode (connect compatibility) and made
  * the classic-expression accessors private; custom Catalyst expressions
  * still need them to surface as user-facing Columns. This is the one
  * sanctioned-namespace shim in the codebase.
  */
package object graftbridge {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Register a custom Catalyst expression as a SQL-callable function on
    * an existing session (the in-session counterpart of injecting through
    * `SparkSessionExtensions`).
    */
  def registerFunction(spark: SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
