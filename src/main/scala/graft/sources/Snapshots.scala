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
}
