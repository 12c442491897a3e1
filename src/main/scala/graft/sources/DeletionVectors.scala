package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** DELETION-VECTOR merge-on-read — the lakehouse delete path that does
  * NOT rewrite data files (Delta deletion vectors / Iceberg positional
  * deletes / Hudi MoR, re-expressed Spark-first).
  *
  * The engine already has the REWRITE delete (e27: partition-pruned
  * dynamic overwrite — pay the write cost now, reads stay clean). This
  * is its complement for high-churn tables at 100 TB, where rewriting a
  * multi-GB file to delete ten rows is the wrong trade:
  *
  *  - a DELETE appends only the deleted KEYS to a tiny sidecar
  *    directory — O(|deletes|) written bytes, never O(|file|);
  *  - a READ scans the base files untouched and applies the union of
  *    all delete batches as one LEFT ANTI join; the sidecar is orders
  *    of magnitude smaller than the base, so the join broadcasts and
  *    the base-side scan keeps its pushed filters and column pruning
  *    (asserted in the spec) — the merge costs one broadcast hash
  *    probe per row, no shuffle of the base;
  *  - compaction (the io7 pass) eventually folds accumulated vectors
  *    into a rewrite and empties the sidecar — the standard
  *    MoR-then-compact lifecycle.
  *
  * Keys, not file/row positions: positional vectors require a stable
  * file layout contract that plain parquet dirs don't give; key-based
  * vectors survive compaction and re-partitioning unchanged.
  */
object DeletionVectors {

  /** Append one delete batch (a frame of keys) to the sidecar dir.
    * Append-mode: batches accumulate; readers take the union. A key
    * deleted twice is deleted once (the read path distincts). Single
    * delete-writer at a time assumed — same contract as e27.
    */
  def appendDeletes(deletedKeys: DataFrame, dvDir: String): Unit =
    deletedKeys.coalesce(1).write.mode(SaveMode.Append).parquet(dvDir)

  /** Merge-on-read scan: base files untouched, minus every key in the
    * sidecar. The anti-join side is `broadcast()`-hinted — a deletion
    * vector that outgrows broadcast is the signal to compact, not to
    * shuffle the base table.
    */
  def readMergeOnRead(
      spark: SparkSession,
      baseDir: String,
      dvDir: String,
      keyCol: String): DataFrame = {
    val base = spark.read.parquet(baseDir)
    val dv = spark.read.parquet(dvDir).select(col(keyCol)).distinct()
    base.join(broadcast(dv), Seq(keyCol), "left_anti")
  }

  /** FOLDING COMPACTION — the lifecycle close the object Scaladoc
    * promises (io13): rewrite base-minus-vectors once and TRUNCATE the
    * sidecar, so reads stop paying the anti-probe until deletes
    * accumulate again. One [[readMergeOnRead]] scan written to
    * `compactedDir` (the anti-join cost paid exactly once), then the
    * sidecar is overwritten with a zero-row frame of the SAME schema —
    * built from the captured schema, never by reading-while-overwriting
    * the dir. Ordering is crash-safe the cheap way: the compacted copy
    * lands fully before the sidecar empties, so a crash between the
    * two steps leaves the OLD base + non-empty sidecar view and the
    * new dir both readable and equivalent.
    *
    * Retry windows, each covered (unit-locked):
    *  - crash BEFORE the truncation: the sidecar is still non-empty, a
    *    retry re-folds the same survivors and overwrites `compactedDir`
    *    with identical rows;
    *  - crash AFTER the truncation (or a double call): the sidecar is
    *    empty and `compactedDir` is already populated — the fold NO-OPS.
    *    Without this guard a retry against the ORIGINAL `baseDir` would
    *    read base-minus-nothing and overwrite the compacted copy with
    *    previously-deleted rows resurrected;
    *  - crash MID-truncation (the parquet overwrite is not atomic):
    *    `dvDir` may be left schema-unreadable, in which case the retry
    *    FAILS LOUDLY at the sidecar read — repair by writing a zero-row
    *    frame of the key schema to `dvDir`, never by guessing.
    * An empty sidecar with NO existing compacted copy still folds (a
    * plain copy — the refold-onto-a-fresh-dir shape). After a completed
    * fold the compacted dir IS the new base: later deletes must append
    * against it, and later folds must pass it as `baseDir` (folding the
    * original base again would lose the already-folded deletes).
    * Post-fold invariants, all spec/oracle-locked:
    * `readMergeOnRead(compactedDir, dvDir)` ≡ the pre-fold MoR view,
    * the sidecar holds 0 rows, and pushdown/pruning survive on the
    * compacted base (it is a plain parquet dir). Writes one file per
    * input partition; pass the frame through io7-style `coalesce`
    * downstream if small-file pressure matters more than write
    * parallelism. Single writer, as everywhere in this family.
    */
  def foldCompact(
      spark: SparkSession,
      baseDir: String,
      dvDir: String,
      keyCol: String,
      compactedDir: String): Unit = {
    val dv = spark.read.parquet(dvDir)
    val dvSchema = dv.schema
    // completed-fold retry guard (ADVICE r13): an empty sidecar with a
    // populated compacted dir is the post-truncation state — re-folding
    // the original base here would resurrect every previously-deleted
    // row into compactedDir. One limit-1 probe + a driver-side listing.
    if (dv.isEmpty) {
      val cp = new org.apache.hadoop.fs.Path(compactedDir)
      val fs = cp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(cp) && fs.listStatus(cp).nonEmpty) return
    }
    readMergeOnRead(spark, baseDir, dvDir, keyCol)
      .write.mode(SaveMode.Overwrite).parquet(compactedDir)
    spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), dvSchema)
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(dvDir)
  }
}
