package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` Column ↔ catalyst-Expression conversion and
  * Dataset construction so graft's custom expressions and logical plans
  * can be used from the public DataFrame API. Lives in the o.a.s.sql
  * package purely for access; no Spark internals are modified.
  */
object GraftSqlShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** EAGER Column → catalyst conversion via the active session's node
    * converter. [[expression]] wraps lazily (ColumnNodeExpression, only
    * unwrapped on the Dataset path); an expression returned from a
    * FunctionRegistry builder never takes that path and would reach
    * codegen still wrapped — this converts to plain (possibly
    * Unresolved*) catalyst nodes that the fixed-point analyzer finishes.
    */
  def expressionEager(c: Column): Expression =
    SparkSession.active.asInstanceOf[classic.SparkSession].expression(c)

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def analyzedPlan(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.analyzed

  /** external Row → InternalRow converter for a schema (DSv2 readers). */
  def rowToInternal(st: types.StructType): Row => catalyst.InternalRow = {
    val conv = catalyst.CatalystTypeConverters.createToCatalystConverter(st)
    r => conv(r).asInstanceOf[catalyst.InternalRow]
  }

  /** InternalRow → external Row converter for a schema (DSv2 writers). */
  def internalToRow(st: types.StructType): catalyst.InternalRow => Row = {
    val conv = catalyst.CatalystTypeConverters.createToScalaConverter(st)
    r => conv(r).asInstanceOf[Row]
  }
}
