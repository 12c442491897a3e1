package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The general SQL entry point — the first surface a user of a query
  * engine reaches for: register every testdata table once, then route
  * arbitrary ANSI SQL through Catalyst.
  *
  * There is deliberately nothing clever here. The views are thin logical
  * plans over the parquet scans, so every Catalyst optimization the
  * DataFrame surface enjoys — predicate pushdown into the scan, column
  * pruning, join reorder, broadcast selection, AQE — applies unchanged to
  * SQL text (the sql1–sql3 gate queries pin that end to end; PlanSpec
  * asserts the pushdown visibly reaches the scan). At cluster scale the
  * same two calls work against any catalog-backed tables; the `dir`
  * parameter only reflects the gate's directory-of-parquet layout.
  */
object GraftSql {

  /** Plain parquet-backed tables (schema used as stored). */
  private val plainTables = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "documents", "embeddings")

  /** Register all testdata tables under `dir` as session temp views,
    * replacing any prior registration (idempotent per session+dir).
    * `events` goes through [[graft.sources.Tables.events]] so its
    * TIMESTAMP(NANOS) column arrives as a proper timestamp here too.
    */
  def register(spark: SparkSession, dir: String): Unit = {
    plainTables.foreach { n =>
      graft.sources.Tables(spark, dir, n).createOrReplaceTempView(n)
    }
    graft.sources.Tables.events(spark, dir).createOrReplaceTempView("events")
    // the native expressions ride along: SQL users get graft_dot /
    // graft_proj without touching the Column API
    graft.functions.VectorFunctions.registerSqlFunctions(spark)
  }

  /** Register (idempotent) and run one SQL statement. */
  def sql(spark: SparkSession, dir: String, query: String): DataFrame = {
    register(spark, dir)
    spark.sql(query)
  }
}
