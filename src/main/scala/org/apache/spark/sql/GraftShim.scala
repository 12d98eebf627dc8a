package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column <-> Expression converters, needed
  * to expose custom Catalyst expressions (e.g. `PartialRatioExpr`) as
  * user-facing `Column` functions on Spark 4 (where `Column.expr` moved
  * behind `classic.ExpressionUtils`).
  */
object GraftShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Bridge to `private[sql]` Dataset.ofRows — needed to hand a
    * hand-built LogicalRelation (e.g. over a custom FileIndex) back to
    * the user as a DataFrame.
    */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Bridge to the `private[sql]` session TableFunctionRegistry —
    * RUNTIME registration of a SQL table-valued function on an already-
    * built session (the extensions path needs `spark.sql.extensions`
    * set at session construction; the driver contract builds plain
    * sessions).
    */
  def registerTableFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] =>
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Unit = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    cs.sessionState.tableFunctionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier(name),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        GraftShim.getClass.getName, name),
      builder)
    ()
  }
}
