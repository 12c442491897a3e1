package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Edge ingestion.
  *
  * Reproduces the reference's SNAP edge-list parsing semantics
  * (reference: `code/PageRankMapReduce/src/main/java/edu/practice/pagerank/
  * GraphBuilderMapper.java:17-44`):
  *   - one edge per line, whitespace-separated (`\s+` split)
  *   - `#`-prefixed comment lines and blank lines skipped
  *   - lines with fewer than 2 tokens dropped; extra tokens ignored
  *   - duplicate edges collapse to one (GraphBuilderReducer.java:17 uses a
  *     LinkedHashSet — NetworkX-aligned edge-set semantics)
  *   - self-loops kept
  *
  * Everything is expressed with built-in codegen'd functions so the whole
  * parse stays inside one WholeStageCodegen stage — no UDFs, no RDDs. At
  * 100 TB the text scan is embarrassingly parallel (one task per file
  * split) and the only shuffle is the final `distinct`, which AQE sizes.
  */
object EdgeListReader {

  /** Parse a SNAP-format edge list into a deduped `edges(src, dst)` frame
    * with LONG vertex ids.
    */
  def snap(spark: SparkSession, path: String): DataFrame =
    fromLines(spark.read.text(path))

  /** Same parse over an existing single-column text DataFrame (used by
    * tests to feed literal fixture strings).
    */
  def fromLines(lines: DataFrame): DataFrame = {
    val col0 = lines.columns.head
    lines
      .select(trim(col(col0)).as("line"))
      .filter(col("line") =!= "" && !col("line").startsWith("#"))
      .select(split(col("line"), "\\s+").as("toks"))
      .filter(size(col("toks")) >= 2)
      // try_cast: ANSI mode (Spark 4 default) makes a plain cast THROW on
      // malformed tokens; the reference drops such rows
      .select(
        expr("try_cast(toks[0] AS BIGINT)").as("src"),
        expr("try_cast(toks[1] AS BIGINT)").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
  }

  /** Giraph adjacency-text ingest (`vertexId nbr1 nbr2 ...` per line, all
    * longs — reference Giraph module `PageRankDriver.java:79`
    * LongLongNullTextInputFormat). Flattens to the edge schema. A vertex
    * line with no neighbors produces no edges — callers that must keep
    * isolated vertices (the CLI does) pair this with
    * [[giraphVertices]] as the explicit vertex universe.
    */
  def giraphAdjacency(spark: SparkSession, path: String): DataFrame = {
    val toks = spark.read
      .text(path)
      .select(trim(col("value")).as("line"))
      .filter(col("line") =!= "" && !col("line").startsWith("#"))
      .select(split(col("line"), "\\s+").as("toks"))
    toks
      .select(
        expr("try_cast(toks[0] AS BIGINT)").as("src"),
        explode(slice(col("toks"), 2, Int.MaxValue)).as("dstStr"))
      .select(
        col("src"),
        expr("try_cast(dstStr AS BIGINT)").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
  }

  /** The vertex ids enumerated by a Giraph adjacency file (first token of
    * every line) — includes vertices with no neighbors, which
    * [[giraphAdjacency]]'s edge view cannot represent.
    */
  def giraphVertices(spark: SparkSession, path: String): DataFrame =
    spark.read
      .text(path)
      .select(trim(col("value")).as("line"))
      .filter(col("line") =!= "" && !col("line").startsWith("#"))
      .select(split(col("line"), "\\s+").as("toks"))
      .select(expr("try_cast(toks[0] AS BIGINT)").as("id"))
      .filter(col("id").isNotNull)
      .distinct()

  /** Deterministic graph derived from the relational testdata: one edge per
    * distinct (customer, supplier) pair that co-occur on an order. Both the
    * engine and the DuckDB oracle can compute this, which makes every graph
    * query hash-checkable. Supplier ids are offset into their own id space
    * so customer/supplier key collisions don't merge vertices.
    */
  def fromOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")
    orders
      .join(lineitem, orders("o_orderkey") === lineitem("l_orderkey"))
      .select(
        orders("o_custkey").as("src"),
        (lineitem("l_suppkey") + lit(1000000L)).as("dst"))
      .distinct()
  }

  /** The SQL twin of [[fromOrders]] for DuckDB oracles. */
  val fromOrdersSql: String =
    "SELECT DISTINCT o_custkey AS src, l_suppkey + 1000000 AS dst " +
      "FROM orders JOIN lineitem ON o_orderkey = l_orderkey"

  /** WEIGHTED twin of [[fromOrders]]: the edge weight is the number of
    * lineitems the (customer, supplier) pair co-occur on — a natural
    * interaction-strength weight, deterministic and recomputable by any
    * engine (which is what makes weighted PageRank hash-checkable).
    */
  def fromOrdersWeighted(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")
    orders
      .join(lineitem, orders("o_orderkey") === lineitem("l_orderkey"))
      .groupBy(
        orders("o_custkey").as("src"),
        (lineitem("l_suppkey") + lit(1000000L)).as("dst"))
      .agg(count("*").cast("double").as("w"))
  }

  /** The SQL twin of [[fromOrdersWeighted]] for DuckDB oracles. */
  val fromOrdersWeightedSql: String =
    "SELECT o_custkey AS src, l_suppkey + 1000000 AS dst, " +
      "CAST(count(*) AS DOUBLE) AS w " +
      "FROM orders JOIN lineitem ON o_orderkey = l_orderkey GROUP BY 1, 2"

  // WEAK keys AND weak values: a discarded or stopped session's entry
  // becomes collectable as soon as the caller drops the session — the
  // previous applicationId-keyed process-global map pinned dead
  // DataFrames for the life of the JVM. Values must be WeakReferences
  // too: a strongly-held DataFrame references its session, which would
  // resurrect the weak KEY through the value chain and make the entry
  // immortal. Losing a value ref is cheap — the materialized blocks live
  // in Spark's plan-matched CacheManager, so a rebuilt frame reattaches
  // to them instead of recomputing. Guarded by its own monitor
  // (WeakHashMap is not thread-safe).
  private val derivedCache = new java.util.WeakHashMap[
    SparkSession,
    java.util.HashMap[String, java.lang.ref.WeakReference[DataFrame]]]()

  /** [[fromOrders]] with session-scoped shared-scan caching: several
    * queries in one session derive the same graph, so the deduped edge
    * frame is cached once per (session, dir) — the same thing a shared
    * scan/materialized-CTE layer does in a warehouse engine. Correctness
    * is unaffected: the frame is deterministic for a given dir. Entries
    * are keyed per SparkSession (weakly — see [[derivedCache]]); a
    * session that wants its blocks back eagerly calls [[release]].
    */
  def fromOrdersCached(spark: SparkSession, sfDir: String): DataFrame =
    derivedCache.synchronized {
      val perSession = derivedCache.computeIfAbsent(
        spark,
        _ => new java.util.HashMap[
          String, java.lang.ref.WeakReference[DataFrame]]())
      val ref = perSession.get(sfDir)
      val hit = if (ref == null) null else ref.get()
      if (hit != null) hit
      else {
        val e = fromOrders(spark, sfDir).cache()
        e.count() // materialize once (no-op if blocks are still cached)
        perSession.put(sfDir, new java.lang.ref.WeakReference(e))
        e
      }
    }

  /** Unpersist and forget every derived-graph cache of `spark`. The weak
    * map already lets a dropped session's entry be collected; this is the
    * eager path for callers that keep the session alive but want the
    * storage back (the next [[fromOrdersCached]] call rebuilds).
    */
  def release(spark: SparkSession): Unit = derivedCache.synchronized {
    val m = derivedCache.remove(spark)
    if (m != null) m.forEach { (dir, ref) =>
      // if the weak value was already collected, rebuild the (identical)
      // plan — unpersist matches by plan, so the blocks are freed either way
      val df = { val d = ref.get(); if (d != null) d else fromOrders(spark, dir) }
      df.unpersist(false)
      ()
    }
  }

  /** Test hook: live session entries (forces expunging of stale refs). */
  private[graft] def cachedSessionCount: Int =
    derivedCache.synchronized(derivedCache.size)

  /** Test hook: this session's entries whose weak value is still live. */
  private[graft] def liveValueCount(spark: SparkSession): Int =
    derivedCache.synchronized {
      val m = derivedCache.get(spark)
      if (m == null) 0
      else {
        var n = 0
        m.values.forEach(r => if (r.get() != null) n += 1)
        n
      }
    }
}
