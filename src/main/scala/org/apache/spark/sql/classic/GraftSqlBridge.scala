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

  /** Rebuild a (materialized) frame over its own InternalRow RDD,
    * DROPPING the origin plan's statistics — zero-copy (`toRdd` of a
    * checkpointed frame is the checkpoint blocks themselves).
    *
    * Why this exists: `localCheckpoint` PRESERVES the origin plan's
    * size estimate, and a loop whose round is join-shaped multiplies
    * child estimates — so the carried stat's BIT LENGTH doubles every
    * round (measured: 17 → 2026 bits in 8 rounds of a self-join loop).
    * Past ~20 rounds the BigInt arithmetic inside Catalyst's size
    * visitor dominates planning time, and at ~31 doublings
    * `BigInteger` overflows its supported range and the loop dies —
    * exactly what a 39-round HashMin on a path graph hit. The rebuilt
    * frame reports the session default size instead (conservative:
    * never broadcast), and AQE's runtime sizes take over at exchange
    * boundaries as usual. `internalCreateDataFrame` is `private[sql]`,
    * hence the bridge.
    */
  def resetStats(
      df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val ds = df.asInstanceOf[Dataset[_]]
    ds.sparkSession
      .internalCreateDataFrame(ds.queryExecution.toRdd, ds.schema)
  }

  /** Re-plan a batch frame as a STREAMING frame — the contract a V1
    * streaming `Source.getBatch` must honor (`MicroBatchExecution`
    * asserts `isStreaming` on the returned plan; FileStreamSource and
    * Delta's DeltaSource use exactly this `internalCreateDataFrame`
    * path, which is `private[sql]`, hence the bridge). Zero-copy:
    * `toRdd` is the lazily-planned InternalRow RDD of the batch plan.
    */
  def streamingFrame(
      df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val ds = df.asInstanceOf[Dataset[_]]
    ds.sparkSession.internalCreateDataFrame(
      ds.queryExecution.toRdd, ds.schema, isStreaming = true)
  }
}
