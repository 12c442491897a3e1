package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Output-side operators.
  *
  * The reference's sinks are text dirs plus a driver-side single-file
  * merge (SURVEY.md §2.2 "Sinks"); the engine's production sinks are
  * columnar and layout-aware:
  *
  *  - [[writePartitioned]]: hive-style directory partitioning so readers
  *    prune whole directories on the partition predicate;
  *  - [[writeBucketed]]: pre-shuffled bucket layout so later equi-joins
  *    and aggregations on the bucket key run with NO exchange at all —
  *    the physical analogue of the reference keeping adjacency keyed by
  *    node id across iterations, but durable across jobs. At 100 TB,
  *    bucketing the fact tables on the join key once turns every
  *    subsequent join into a zip of co-located files.
  */
object Sinks {

  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  /** Single-file text sink (the reference's merge contract, O17). */
  def writeSingleTextFile(df: DataFrame, path: String, sep: String = "\t"): Unit =
    df.coalesce(1)
      .write.mode(SaveMode.Overwrite)
      .option("sep", sep)
      .csv(path)

  def writePartitioned(
      df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Bucketed managed table (bucketBy requires the table catalog). */
  def writeBucketed(
      spark: SparkSession,
      df: DataFrame,
      table: String,
      bucketCol: String,
      nBuckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
}
