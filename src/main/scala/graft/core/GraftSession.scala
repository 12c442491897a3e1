package graft.core

import org.apache.spark.sql.SparkSession

/** SparkSession factory for the engine.
  *
  * Defaults are tuned for the driver's local[32] test environment but the
  * settings are the ones that matter on a real cluster too: AQE on (runtime
  * re-planning, skew-join splitting, dynamic coalescing of shuffle
  * partitions), UTC session time zone (oracle parity with DuckDB), and a
  * shuffle-partition count sized to the actual parallelism instead of the
  * 200 default.
  */
object GraftSession {

  def cpus: Int =
    sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(32)

  def local(appName: String = "graft", nCpus: Int = cpus): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$nCpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", nCpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // TIMESTAMP(NANOS) parquet (the events table) is rejected by the
      // vectorized reader unless surfaced as LONG nanos. Set ONCE at
      // session build so readers (Tables.events, EventStreams) stay
      // side-effect-free — a reader must never silently flip global
      // parquet semantics mid-session.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Apply engine settings to an externally-created session (driver-owned
    * sessions in Verify/Bench).
    */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark
  }
}
