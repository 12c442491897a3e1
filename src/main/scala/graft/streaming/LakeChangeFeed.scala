package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** STREAMING CONSUMPTION of the KEYED lake table's ROW-LEVEL change
  * feed (st29 — the Delta CDF streaming source, the production form of
  * the medallion hop p16 runs batch-style): a consumer keeps a
  * COMMITTED GENERATION offset (the manifest generation it has fully
  * processed, advanced by one atomic rename AFTER processing) and per
  * poll reads exactly `changesBetween(offset, head)` — the net
  * row-level diff of what the intervening merges/deletes rewrote,
  * never the table. [[ChangeFeed]] streams the append-only Snapshots
  * feed where a "change" is a whole committed batch; this streams the
  * LakeTable feed where a change is a ROW with `_change_type` ∈
  * {insert, update_pre, update_post, delete} — the shape a downstream
  * aggregate can apply with signed contributions.
  *
  * Bootstrap is the Delta streaming-source initial snapshot: the first
  * poll reads the head generation's full state via `readAt` as one
  * batch of `insert` rows (planned from the immutable generation
  * manifest, so a concurrent writer cannot tear it), then commits that
  * generation as the offset.
  *
  * Delivery contract (ChangeFeed's, unchanged): offsets commit AFTER
  * processing, so the crash window between "sink wrote" and "offset
  * committed" REDELIVERS that generation range — at-least-once; pair
  * with a range-keyed idempotent sink (partition by the target
  * generation ordinal; a redelivered range overwrites its own
  * directory) and the composition is exactly-once end to end.
  *
  * Retention interplay (stated, not hidden): the offset names a
  * GENERATION, and `changesBetween` reads only RETAINED generations —
  * a consumer that stalls past the sweep's grace window fails LOUDLY
  * on its next poll (the Delta `startingVersion`-expired error) rather
  * than silently skipping rows; re-bootstrap is the recovery. One
  * consumer per `consumerDir`, as with [[ChangeFeed]].
  */
object LakeChangeFeed {

  private def offsetPath(consumerDir: String) = s"$consumerDir/_offset_gen"

  /** The consumer's committed generation offset; None before the
    * bootstrap poll.
    */
  def committedGen(
      spark: SparkSession, consumerDir: String): Option[String] = {
    import org.apache.hadoop.fs.Path
    val p = new Path(offsetPath(consumerDir))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val buf = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
      val in = fs.open(p)
      try in.readFully(0, buf)
      finally in.close()
      Some(new String(buf, "UTF-8").trim)
    }
  }

  /** Advance the committed offset: tmp file + ONE atomic rename (the
    * io12c pointer discipline).
    */
  private[graft] def commitGen(
      spark: SparkSession, consumerDir: String, gen: String): Unit = {
    import org.apache.hadoop.fs.{CreateFlag, FileContext, Options, Path}
    val conf = spark.sparkContext.hadoopConfiguration
    val dst = new Path(offsetPath(consumerDir))
    val fc = FileContext.getFileContext(
      dst.getFileSystem(conf).getUri, conf)
    val tmp = new Path(s"$consumerDir/_offset_gen_tmp")
    fc.mkdir(
      tmp.getParent,
      org.apache.hadoop.fs.permission.FsPermission.getDirDefault, true)
    val out = fc.create(
      tmp, java.util.EnumSet.of(CreateFlag.CREATE, CreateFlag.OVERWRITE))
    try out.write(gen.getBytes("UTF-8"))
    finally out.close()
    fc.rename(tmp, dst, Options.Rename.OVERWRITE)
  }

  /** One poll: if the lake head moved past the committed offset, hand
    * the feed rows to `process` and THEN commit the head generation.
    * `process` receives (feed, fromGen — None on the bootstrap poll —
    * and toGen); the to-generation's ordinal is what a range-keyed
    * idempotent sink partitions by (it also rides every feed row as
    * `_generation`). Returns the polled range, or None when caught up.
    */
  def poll(
      spark: SparkSession,
      lakeRoot: String,
      key: String,
      consumerDir: String)(
      process: (DataFrame, Option[String], String) => Unit)
      : Option[(Option[String], String)] = {
    val from = committedGen(spark, consumerDir)
    val head = graft.sources.LakeTable.currentName(spark, lakeRoot)
      .getOrElse(sys.error(s"nothing committed under $lakeRoot"))
    from match {
      case Some(f) if f == head => None // caught up — a normal poll
      case Some(f) =>
        val feed = graft.sources.LakeTable
          .changesBetween(spark, lakeRoot, key, f, head)
        process(feed, from, head)
        commitGen(spark, consumerDir, head)
        Some((from, head))
      case None =>
        // bootstrap: the head state as one insert batch (initial
        // snapshot), planned from the immutable generation manifest
        val snap = graft.sources.LakeTable.readAt(spark, lakeRoot, head)
          .withColumn("_change_type", lit("insert"))
          .withColumn(
            "_generation", lit(graft.sources.LakeTable.ordinal(head)))
        process(snap, None, head)
        commitGen(spark, consumerDir, head)
        Some((None, head))
    }
  }

  /** The poll loop as a Structured Streaming job — ticks carry no
    * data, they are the schedule (rate source in production;
    * MemoryStream in the spec and the st29 row, where the test lands
    * merges/deletes between ticks and plants a crashed poll).
    */
  def streamingConsumer(
      ticks: DataFrame,
      lakeRoot: String,
      key: String,
      consumerDir: String)(
      process: (DataFrame, Option[String], String) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    ticks.writeStream
      .foreachBatch { (_: DataFrame, _: Long) =>
        poll(ticks.sparkSession, lakeRoot, key, consumerDir)(process)
        ()
      }
      .start()
}
