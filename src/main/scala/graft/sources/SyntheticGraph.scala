package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic distributed synthetic-graph generation (FIXTURES.md F6):
  * a seeded power-law digraph shaped like SNAP web-Google (≈875k vertices,
  * ≈5.1M edges, heavy in-degree skew — reference README.md:118,410-414),
  * used by the bench to measure per-iteration PageRank cost at the
  * reference's S1 scale.
  *
  * Generation is pure column algebra over `spark.range(nEdges)` — each
  * edge's endpoints derive from xxhash64(seed, i), so the graph is
  * identical across runs, partitionings, and cluster sizes, with no
  * driver-side loops and no data movement until the dedup shuffle.
  *
  * dst uses inverse-CDF power-law sampling (`floor(N·u^γ)`): small ids
  * become hubs, reproducing the in-degree skew the reference documents
  * (web-Google max/mean in-degree ratio ≈ 74).
  */
object SyntheticGraph {

  private val M = (1L << 40).toDouble

  private def uniform(seed: Long, salt: Int): org.apache.spark.sql.Column =
    pmod(xxhash64(lit(seed), col("id"), lit(salt)), lit(1L << 40))
      .cast("double") / M

  def powerLaw(
      spark: SparkSession,
      nVertices: Long,
      nEdges: Long,
      seed: Long = 42L,
      gamma: Double = 1.45): DataFrame = {
    // γ=1.45 calibrates max/mean in-degree to ≈74 at web-Google scale:
    // edges landing on the top vertex ≈ E·N^(-1/γ), so
    // skew ≈ N^(1-1/γ) ≈ N^0.31 ≈ 69 at S1 scale (measured ≈72).
    // No distinct() here: PageRank fuses edge-set dedup into its
    // src-repartition shuffle (one full-edge shuffle total); standalone
    // consumers that need set semantics dedup at the use site.
    spark
      .range(nEdges)
      .select(
        floor(uniform(seed, 1) * nVertices).cast("long").as("src"),
        floor(pow(uniform(seed, 2), gamma) * nVertices)
          .cast("long").as("dst"))
  }

  /** S1-shaped graph (web-Google scale) or a 1/10 version for smaller
    * scale factors — keyed off the testdata dir name the driver passes.
    */
  def s1Shaped(spark: SparkSession, sfDir: String): DataFrame =
    if (sfDir.contains("sf0.1"))
      powerLaw(spark, 875000L, 5100000L)
    else
      powerLaw(spark, 87500L, 510000L)

  /** S3-shaped graph (soc-LiveJournal1 scale: ≈4.85M vertices, ≈69M
    * edges — reference README.md:118, BASELINE.md S3) at sf0.1, or a
    * 1/100 version for the correctness gate. The S3 shape is 13× the S1
    * bench fixture and is what the bench uses to measure the PageRank
    * SHUFFLE-FALLBACK path (the state no longer broadcasts), i.e. the
    * plan a 100 TB graph actually runs.
    */
  def s3Shaped(spark: SparkSession, sfDir: String): DataFrame =
    if (sfDir.contains("sf0.1"))
      powerLaw(spark, 4850000L, 69000000L)
    else
      powerLaw(spark, 48500L, 690000L)

  /** EXTREME single-hub skew fixture: `hubFrac` of all edge samples point
    * at vertex 0, the rest at uniform-random vertices; sources are
    * uniform. With nVertices comparable to nEdges the hub's in-degree
    * survives edge-set dedup at ~hubFrac·nEdges (most (src, 0) pairs are
    * distinct), so the contribution aggregation sees ONE key holding
    * many multiples of a partition's average rows — the condition
    * `PageRankConfig.saltBuckets` exists for, which ordinary power-law
    * graphs (web-graph skew) never reach. Same zero-data-movement
    * generation shape as [[powerLaw]].
    */
  def singleHub(
      spark: SparkSession,
      nVertices: Long,
      nEdges: Long,
      hubFrac: Double = 0.5,
      seed: Long = 77L,
      hubId: Long = 0L): DataFrame =
    spark
      .range(nEdges)
      .select(
        floor(uniform(seed, 1) * nVertices).cast("long").as("src"),
        when(uniform(seed, 3) < hubFrac, lit(hubId))
          .otherwise(floor(uniform(seed, 2) * nVertices).cast("long"))
          .as("dst"))

  /** Bench-scale hub fixture: 20M vertices / 20M edges, 90% of samples
    * into the hub (sf0.1), or 1/10 that for the correctness gate. After
    * dedup the hub holds ≈20M·(1−e^{−0.9}) ≈ 11.9M in-edges of a ≈13.9M
    * total — ~27× a 32-partition task's average row count on ONE key, so
    * the unsalted contribution aggregation's hub reducer genuinely
    * dominates the stage's critical path. This is the scale at which the
    * salted-vs-unsalted experiment (g18) is informative: the earlier
    * 2M/5M/0.5 shape left the hub task at ~12× a (tiny) average — tens
    * of milliseconds of extra sum work that vanished under fixed stage
    * costs, so salting's second exchange could only lose. Measured on
    * this shape: salt0 ≈ 14.5–18 s, salt32 ≈ 10.7–10.9 s per 2-iteration
    * run — the crossover salting exists for, now standing in the bench.
    */
  def hubShaped(spark: SparkSession, sfDir: String): DataFrame =
    if (sfDir.contains("sf0.1"))
      singleHub(spark, 20000000L, 20000000L, hubFrac = 0.9)
    else
      singleHub(spark, 2000000L, 2000000L, hubFrac = 0.9)

  /** Skew fixture for the triangle-orientation bench pair (g20): a hub
    * at a MID-RANGE id. Under the naive id-ordering the wedge count at
    * a hub is (#lower-id neighbors)·(#higher-id neighbors) — a hub at
    * id 0 pays nothing (it is always the canonical `u`), so the skew
    * that hurts id-ordering needs the hub mid-range, where it pays
    * ≈ d²/4 wedge rows (≈9.6·10⁷ at the sf0.1 shape's d≈19.6k).
    * Degree-ordering orients every hub edge inward: zero wedges at the
    * hub regardless of its id. Measured idle at sf0.1: id-ordered
    * ≈8.5–11 s vs degree-ordered ≈3.1–3.8 s per run — the crossover
    * the orientation pass exists for.
    */
  def triSkewShaped(spark: SparkSession, sfDir: String): DataFrame =
    if (sfDir.contains("sf0.1"))
      singleHub(spark, 500000L, 250000L, hubFrac = 0.08, seed = 91L,
        hubId = 250000L)
    else
      singleHub(spark, 50000L, 25000L, hubFrac = 0.08, seed = 91L,
        hubId = 25000L)

  /** PORTABLE uniform random digraph: endpoints derive from md5 (not
    * xxhash64), so an oracle engine can regenerate the identical edge
    * set — `CAST(concat('0x', substr(md5(i || ':s:' || salt), 1, 8)) AS
    * BIGINT) % n` in DuckDB ≡ the `conv(substring(md5(..),1,8),16,10)`
    * column below. Used by the graph-analytics queries (components,
    * triangles) that need a non-bipartite fixture the relational-derived
    * graph cannot provide. Same zero-data-movement generation shape as
    * [[powerLaw]].
    */
  def portable(
      spark: SparkSession,
      nVertices: Long,
      nEdges: Long,
      salt: String): DataFrame = {
    def endpoint(tag: String) =
      pmod(
        conv(
          substring(
            md5(concat_ws(":", col("id").cast("string"), lit(tag), lit(salt))),
            1, 8),
          16, 10).cast("long"),
        lit(nVertices))
    spark
      .range(nEdges)
      .select(endpoint("s").as("src"), endpoint("d").as("dst"))
  }

  /** PORTABLE planted 2-community graph: two disjoint [[portable]]
    * blocks (ids [0, nVBlock) salted `saltA`, ids [nVBlock, 2·nVBlock)
    * salted `saltB`) with no cross-block edges — the ground-truth
    * structure a converged community detector must find (a single
    * connected random graph has NO community structure: min-label floods
    * it to one community). Regenerable in an oracle engine by two
    * md5-range scans, the second shifted by nVBlock.
    */
  def portableBlocks(
      spark: SparkSession,
      nVBlock: Long,
      nEBlock: Long,
      salt: String): DataFrame =
    portable(spark, nVBlock, nEBlock, salt + "A")
      .union(
        portable(spark, nVBlock, nEBlock, salt + "B")
          .select(
            (col("src") + nVBlock).as("src"),
            (col("dst") + nVBlock).as("dst")))
}
