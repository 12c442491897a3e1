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
}
