package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Source}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{LongType, StringType, StructType}

/** A streaming OFFSET that IS a lake manifest generation: `json` is the
  * generation NAME (`g=<ordinal>-<token>`), so the checkpoint's offset
  * log names exactly the immutable manifest each batch ended at —
  * recovery needs no side lookup, and ordering is the name's leading
  * ordinal. (Delta's DeltaSourceOffset carries the table version the
  * same way.)
  */
private[graft] final case class GenOffset(gen: String) extends V1Offset {
  override def json: String = gen
}

/** `spark.readStream.format("graft-cdf")` — the lake's row-level change
  * feed as a FIRST-CLASS streaming source (st30 — r16 verdict #2: st29's
  * poll helper kept its offset in a bespoke consumerDir OUTSIDE the
  * engine's checkpoint; this dissolves that seam). The offset lives in
  * the streaming checkpoint's own offset log, so crash recovery is the
  * engine's (restart from the checkpoint and the planned batch replays
  * with the SAME (start, end] range — pair with a range-keyed idempotent
  * sink for exactly-once, the st29 composition), and N queries each own
  * a checkpoint instead of one-consumer-per-dir.
  *
  * Options: `.load(<lake root>)` (or `option("path", …)`) and
  * `option("key", <manifest key column>)` — the key is validated against
  * the manifest on every read (the r15 wrong-key guard).
  *
  * Batch semantics (LakeChangeFeed's, engine-scheduled): the FIRST batch
  * is the head snapshot as `insert` rows (the Delta initial-snapshot
  * contract, planned from the immutable generation manifest); every
  * later batch is `changesBetween(start, end)` — net row-level diff,
  * delta bytes, never the table. A consumer stalled past the sweep's
  * retention fails LOUDLY on its next batch (the expired
  * `startingVersion` error) rather than skipping rows.
  *
  * V1 `Source` seam by design, not accident: the batch is DEFINED by
  * existing parquet + a manifest diff — `getBatch` returning a planned
  * DataFrame (re-flagged streaming via the classic bridge) is exactly
  * how FileStreamSource and production Delta ship CDF streams; a DSv2
  * `MicroBatchStream` would force hand-built per-file readers for a
  * plan Catalyst already optimizes.
  */
class GraftCdfSourceProvider extends StreamSourceProvider
    with DataSourceRegister {

  override def shortName(): String = "graft-cdf"

  private def params(parameters: Map[String, String]): (String, String) = (
    parameters.getOrElse("path", sys.error(
      "graft-cdf needs the lake root: .load(<root>) or option(\"path\", …)")),
    parameters.getOrElse("key", sys.error(
      "graft-cdf needs option(\"key\", <manifest key column>)")))

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val (root, _) = params(parameters)
    (shortName(), GraftCdfSource.feedSchema(sqlContext.sparkSession, root))
  }

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source = {
    val (root, key) = params(parameters)
    new GraftCdfSource(sqlContext.sparkSession, root, key)
  }
}

private[graft] object GraftCdfSource {
  /** The feed schema: the head generation's table schema plus the CDF
    * columns. Fixed at source creation — schema evolution mid-stream
    * means restart the query (the Delta CDF contract).
    */
  def feedSchema(spark: SparkSession, root: String): StructType = {
    val head = graft.sources.LakeTable.currentName(spark, root)
      .getOrElse(sys.error(
        s"nothing committed under $root — graft-cdf streams a " +
          "committed keyed lake table"))
    graft.sources.LakeTable.readAt(spark, root, head).schema
      .add("_change_type", StringType)
      .add("_generation", LongType)
  }
}

private[graft] class GraftCdfSource(
    spark: SparkSession,
    root: String,
    key: String) extends Source {

  override val schema: StructType = GraftCdfSource.feedSchema(spark, root)

  /** The lake head IS the latest offset — one pointer read per
    * micro-batch planning tick, no listing.
    */
  override def getOffset: Option[V1Offset] =
    graft.sources.LakeTable.currentName(spark, root).map(GenOffset)

  // works for GenOffset AND the checkpoint's SerializedOffset replay —
  // both carry the generation name as their json
  private def genOf(o: V1Offset): String = o.json

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    val endGen = genOf(end)
    val lk = graft.sources.LakeTable
    val frame = start match {
      case None =>
        // initial snapshot: the end generation's full state as insert
        // rows, planned from the immutable manifest (tear-free under
        // concurrent writers)
        lk.readAt(spark, root, endGen)
          .withColumn("_change_type", lit("insert"))
          .withColumn("_generation", lit(lk.ordinal(endGen)))
      case Some(s) =>
        lk.changesBetween(spark, root, key, genOf(s), endGen)
    }
    org.apache.spark.sql.classic.GraftSqlBridge.streamingFrame(
      frame.select(schema.fieldNames.map(col(_)): _*))
  }

  override def stop(): Unit = ()

  override def toString: String = s"GraftCdfSource[$root, key=$key]"
}
