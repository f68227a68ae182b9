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

  /** Re-bind a DataFrame to a clone of its session with the given SQL
    * confs overridden. The clone shares the SparkContext (and therefore
    * cached/checkpointed blocks) but owns its SQLConf, so an iterative
    * operator can run its rounds under e.g. AQE-off without mutating the
    * caller's session — a concurrent query on the original session keeps
    * its own settings, and there is no save/restore window to race on.
    */
  def onClonedSession(df: Dataset[Row], confs: (String, String)*): Dataset[Row] = {
    val cdf = df.asInstanceOf[classic.Dataset[Row]]
    val cloned = cdf.sparkSession.cloneSession()
    confs.foreach { case (k, v) => cloned.conf.set(k, v) }
    classic.Dataset.ofRows(cloned, cdf.queryExecution.logical)
  }
}
