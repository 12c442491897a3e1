package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** SNAPSHOT / TIME-TRAVEL reads over an append-only versioned table —
  * the lakehouse `VERSION AS OF` primitive (Delta time travel / Iceberg
  * snapshots, re-expressed Spark-first), completing the table-lifecycle
  * family next to io7 compaction and io11 deletion vectors.
  *
  * Layout: `root/data/v=<n>/` holds version n's data files;
  * `root/manifest/` is a tiny parquet log with one `(version, path)`
  * row per committed batch. The COMMIT protocol writes data files
  * first and appends the manifest row LAST — the standard ordering: a
  * crash between the two leaves an orphan data dir that no reader ever
  * sees (spec-asserted), never a manifest row pointing at missing data.
  *
  * A versioned READ plans from the manifest, not from directory
  * listing: `VERSION AS OF n` = scan exactly the paths of manifest rows
  * with `version <= n`. The manifest collect is file-batch-sized — the
  * same driver-side planning step every production table format runs —
  * while the data scan stays fully distributed with pushdown intact
  * (it is a plain multi-path parquet scan). Later commits never touch
  * earlier version dirs, so an as-of read is byte-stable forever —
  * snapshot isolation by construction.
  */
object Snapshots {

  /** Commit `df` as version `version`: data first, manifest last.
    * Versions are caller-assigned and strictly increasing; single
    * committer at a time assumed (the e27/io11 contract).
    */
  def commit(df: DataFrame, root: String, version: Int): Unit = {
    val path = s"$root/data/v=$version"
    df.write.mode(SaveMode.Overwrite).parquet(path)
    val spark = df.sparkSession
    import spark.implicits._
    Seq((version, path)).toDF("version", "path")
      .coalesce(1)
      .write.mode(SaveMode.Append).parquet(s"$root/manifest")
  }

  /** `VERSION AS OF asOf`: scan exactly the committed batches with
    * `version <= asOf`. Fails loudly when nothing is committed at or
    * before `asOf` (an empty table is a caller bug, not an empty scan).
    * Paths are DEDUPLICATED before the scan: a committer that crashed
    * after the manifest append and retried the whole commit leaves two
    * manifest rows pointing at the same (idempotently overwritten) data
    * dir — double-scanning it would silently duplicate every row of
    * that version.
    */
  def readVersion(spark: SparkSession, root: String, asOf: Int): DataFrame = {
    val paths = spark.read.parquet(s"$root/manifest")
      .filter(col("version") <= asOf)
      .select(col("path")).collect().map(_.getString(0)).distinct.sorted
    require(
      paths.nonEmpty,
      s"no committed version <= $asOf under $root")
    spark.read.parquet(paths.toIndexedSeq: _*)
  }

  /** EXPIRATION / VACUUM (io12b — Delta `VACUUM` + checkpoint, Iceberg
    * `expireSnapshots`, completing the time-travel lifecycle the way
    * e28/io13 completed the index's and the deletion vectors'). In a
    * pure-append model every batch is referenced by EVERY later
    * snapshot, so old batches can never just be unlinked — expiration
    * must first CHECKPOINT: the full state as of `cut` is consolidated
    * into one new data dir (a distributed read of the old dirs, paid
    * once — the cost every format's checkpoint pays), the manifest is
    * rewritten to `(cut, checkpoint) ∪ rows > cut`, and then every
    * data dir the new manifest does not reference is removed — which
    * sweeps BOTH the expired batch dirs and any ORPHANS from crashed
    * commits (the cleanup path for the crash window [[commit]]
    * documents). Afterwards:
    *
    *  - `readVersion(asOf ≥ cut)` is BYTE-STABLE: checkpoint ∪ the
    *    retained later batches ≡ the old union (spec + oracle-locked);
    *  - `readVersion(asOf < cut)` FAILS LOUDLY (no manifest row ≤
    *    asOf — history below the cut is genuinely retired, not
    *    silently empty);
    *  - a crash after the checkpoint write but before the manifest
    *    swap leaves an invisible orphan the next expire sweeps; the
    *    manifest rewrite itself is the one non-atomic step — a real
    *    deployment swaps an atomic pointer file instead (documented,
    *    single maintenance writer assumed, the e27/io11 contract).
    *
    * Driver work is manifest-sized (collect of the batch list — the
    * standard table-format planning step); deletion uses the
    * Path-resolved FileSystem, never a hardcoded scheme.
    */
  def expire(spark: SparkSession, root: String, cut: Int): Unit = {
    import org.apache.hadoop.fs.Path
    val manifest = spark.read.parquet(s"$root/manifest")
    val all = manifest.select(col("version"), col("path"))
      .collect().map(r => (r.getInt(0), r.getString(1))).distinct
    require(all.exists(_._1 <= cut), s"nothing committed at or before $cut")
    val ckptPath = s"$root/data/ckpt=$cut"
    // idempotence: re-expiring at the same cut would otherwise read the
    // existing checkpoint dir while overwriting it — when the history
    // below the cut is already exactly this checkpoint, skip the rewrite
    // and fall through to the sweep (a crashed previous sweep resumes)
    val alreadyFolded =
      all.filter(_._1 <= cut).map(_._2).distinct.sameElements(
        Array(ckptPath))
    val kept =
      if (alreadyFolded) (cut, ckptPath) +: all.filter(_._1 > cut)
      else {
        readVersion(spark, root, cut)
          .write.mode(SaveMode.Overwrite).parquet(ckptPath)
        (cut, ckptPath) +: all.filter(_._1 > cut)
      }
    val spark2 = spark
    import spark2.implicits._
    // rows were collected above — writing the manifest from a local
    // Seq never reads the dir it overwrites
    kept.toSeq.toDF("version", "path")
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$root/manifest")
    val fs = new Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val keepNames = kept.map(p => new Path(p._2).getName).toSet
    val dataDir = new Path(s"$root/data")
    fs.listStatus(dataDir)
      .filter(st => !keepNames.contains(st.getPath.getName))
      .foreach(st => fs.delete(st.getPath, true))
  }
}
