package org.apache.spark.sql.classic

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ↔ Expression bridge for graft's native Catalyst expressions.
  *
  * Spark 4 moved `Column` to a connect-compatible representation; the
  * classic-mode converters (`ExpressionUtils.column/expression`) are
  * `private[sql]`, so this one-file shim lives in the
  * `org.apache.spark.sql.classic` package to re-export exactly the two
  * conversions the engine needs — the standard technique for libraries
  * shipping custom expressions against classic Spark. No Spark behavior
  * is modified or overridden here.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a native expression as a SQL temp function on a LIVE
    * session (the `FunctionRegistry` is `private[sql]`, hence here).
    * The builder-time path for new sessions is
    * `graft.functions.GraftExtensions` via `withExtensions` /
    * `spark.sql.extensions`; this is the same registration applied to an
    * already-built session (e.g. the gate's shared session).
    */
  def registerFunction(
      spark: org.apache.spark.sql.SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[SparkSession].sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
