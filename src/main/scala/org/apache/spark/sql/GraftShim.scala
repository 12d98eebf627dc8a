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

  /** Bridge to the `private[sql]` session SQL parser — needed to parse
    * a DML string (UPDATE/DELETE/MERGE, which Spark's grammar accepts
    * but `spark.sql` cannot execute for path tables) into its catalyst
    * plan for graft's own lowering.
    */
  def parsePlan(spark: SparkSession, sql: String)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    spark.asInstanceOf[classic.SparkSession].sessionState.sqlParser
      .parsePlan(sql)

  /** A SIBLING session sharing this one's SparkContext but built with
    * the given extensions — the way to exercise an extensions-injected
    * rule when the primary session was built plain (the driver
    * contract): `builder().getOrCreate` returns the existing session
    * (ignoring `withExtensions`) unless the active/default session
    * registrations are cleared first, and `newSession()` clones the
    * parent's EMPTY extensions. Public-API only: clear, build with
    * extensions (reusing the live SparkContext), restore.
    */
  def sessionWithExtensions(spark: SparkSession,
      f: SparkSessionExtensions => Unit): SparkSession = {
    val oldActive = SparkSession.getActiveSession
    val oldDefault = SparkSession.getDefaultSession
    try {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.builder().withExtensions(f).getOrCreate()
    } finally {
      oldActive.foreach(SparkSession.setActiveSession)
      oldDefault.foreach(SparkSession.setDefaultSession)
    }
  }

  /** Re-plan a streaming micro-batch frame as a BATCH frame over the
    * same physical rows (`private[sql]` internalCreateDataFrame — the
    * v1 sink discipline the Delta OSS sink uses): a Sink.addBatch
    * frame is bound to the query's IncrementalExecution, and handing
    * it straight to batch verbs that re-analyze (joins, observed
    * metrics, writes) can re-plan against streaming state. The rows
    * stream through untouched; only the plan wrapper changes.
    */
  def rewrapBatch(df: DataFrame): DataFrame = {
    val s = df.sparkSession.asInstanceOf[classic.SparkSession]
    s.internalCreateDataFrame(df.queryExecution.toRdd, df.schema,
      isStreaming = false)
  }

  /** Bridge to the `private[sql]` v1 session catalog — needed to
    * resolve CATALOG-NAMED graft tables (name -> provider + location)
    * inside the DML interception rule, and to invalidate the analyzer's
    * cached relation after a mutation so the next SELECT on the name
    * sees the new snapshot.
    */
  def v1Catalog(spark: SparkSession)
      : org.apache.spark.sql.catalyst.catalog.SessionCatalog =
    spark.asInstanceOf[classic.SparkSession].sessionState.catalog

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
