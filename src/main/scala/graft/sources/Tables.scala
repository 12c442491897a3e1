package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Testdata table readers. */
object Tables {

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Normalize an `events`-shaped frame so `ts` is always a session-zoned
    * TIMESTAMP carrying the file's literal instant, whatever physical
    * encoding the parquet used. The testdata generator has shipped two:
    *
    *  - TIMESTAMP(NANOS), which Spark's vectorized reader rejects unless
    *    `spark.sql.legacy.parquet.nanosAsLong=true` (set at session build
    *    by [[graft.core.GraftSession]]) surfaces it as LONG nanos — floor
    *    to micros with integral `div`, NOT `/`: epoch-nanos (~1.7e18)
    *    exceed double's 2^53 exact range, so float division + cast floors
    *    ~2% of timestamps to the previous microsecond;
    *  - TIMESTAMP_NTZ (micros) — cast to TIMESTAMP. The session time zone
    *    is pinned to UTC ([[graft.core.GraftSession]]), so the cast is
    *    value-preserving and matches DuckDB, which reads the naive
    *    timestamp as-is.
    *
    * Both engines therefore see identical microsecond instants, which is
    * what the epoch_us/unix_micros oracle comparisons rely on. This
    * reader is side-effect-free — it never mutates session conf.
    */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType =>
        // a LongType ts is the nanosAsLong surfacing of TIMESTAMP(NANOS)
        // parquet — epoch NANOseconds by contract. Guard the unit
        // in-plan rather than assume it: a generator switch to epoch
        // micros/millis would otherwise be silently divided into the
        // 1970s. Nanosecond epochs for plausible data (1973..2200+) are
        // ≥ 1e17; micros for the same era are ≤ ~7.3e15, millis smaller
        // still — so the magnitude check separates the encodings with
        // centuries of margin, and raise_error names the fix instead of
        // letting downstream hashes drift.
        df.withColumn(
          "ts",
          when(
            col("ts").isNull || abs(col("ts")) >= lit(100000000000000000L),
            timestamp_micros(expr("ts div 1000")))
            .otherwise(raise_error(concat(
              lit("events.ts LongType expected epoch NANOS, got magnitude "),
              col("ts").cast("string"),
              lit(" — update Tables.normalizeEventTs for the new unit")))))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }

  /** `events.parquet` with `ts` normalized per [[normalizeEventTs]]. */
  def events(spark: SparkSession, dir: String): DataFrame =
    normalizeEventTs(apply(spark, dir, "events"))
}
