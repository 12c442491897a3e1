package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Testdata table readers. */
object Tables {

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.parquet` carries TIMESTAMP(NANOS) which Spark's vectorized
    * parquet reader rejects outright. With
    * `spark.sql.legacy.parquet.nanosAsLong=true` (set at session build by
    * [[graft.core.GraftSession]] — this reader is side-effect-free and
    * does NOT mutate session conf) the column arrives as LONG
    * nanos-since-epoch; convert to a proper microsecond timestamp here so
    * downstream operators (and the DuckDB oracle, which reads TIMESTAMP_NS
    * natively) see the same instants. On a session missing the flag the
    * read fails fast with Spark's "Illegal Parquet type" error.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = apply(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        // integral `div`, NOT `/`: epoch-nanos (~1.7e18) exceed double's
        // 2^53 exact range, so float division + cast floors ~2% of
        // timestamps to the previous microsecond
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw
    }
  }
}
