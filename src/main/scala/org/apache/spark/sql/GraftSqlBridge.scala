package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into `private[sql]` Column↔Expression converters —
  * the standard pattern third-party libraries use to attach custom
  * Catalyst expressions to the public Column API (the converters are
  * public in spirit: Spark's own `functions` object calls the same
  * entry points).
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
  /** Wrap a (resolved) logical plan as a DataFrame — the entry point a
    * custom whole-operator node (e.g. graft.plans.AsOfJoinPlan) needs
    * to surface through the public Dataset API. */
  def dataFrame(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
  /** The analyzed logical plan of a DataFrame (attribute references from
    * it are resolved, so custom nodes built on them pass analysis). */
  def analyzedPlan(df: Dataset[_]): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed
}
