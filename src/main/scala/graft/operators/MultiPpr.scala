package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** BATCHED multi-seed personalized PageRank: |S| independent PPR vectors
  * computed in ONE loop over the edge set — the feature-backfill shape a
  * graph pipeline actually runs ("node-similarity features for this set
  * of query entities"), vs re-running a single-seed loop |S| times and
  * rescanning the edges each time.
  *
  * Formulation (standard PPR-for-similarity, documented here because it
  * deliberately differs from the reference loop's lagged-dangling
  * global PageRank, `PageRankDriver.java:207-216` ↔ `PageRank.scala`):
  * per seed s, `r' = (1-d)·e_s + d·(Pᵀ r + dangling_mass·e_s)` — both
  * the restart and the dangling mass return to the SEED, same-iteration
  * (no lag), init `r0 = e_s`. Mass is conserved at exactly 1 per seed
  * every iteration.
  *
  * State is SPARSE: a `(seed, id, rank)` row exists only once a vertex
  * is reached, so early iterations ship |S|·frontier rows, not
  * |S|·|V|. Scale shape: the edge set exchanges ONCE (hash-partitioned
  * by src, persisted); each iteration joins the state to it on the
  * co-partitioned key, aggregates contributions map-side by
  * (seed, dst), and adds one |S|-row restart frame — the exchange
  * volume is state-sized with map-side combine, the same class as one
  * PageRank iteration per seed-batch. Per-iteration lineage is cut
  * with the eager localCheckpoint rotation shared by every iterative
  * loop here.
  *
  * Determinism: pure double arithmetic off integer degrees; ranks
  * rounded by the caller (the oracle unrolls the identical recurrence
  * with the seed riding as a column).
  */
object MultiPpr {

  /** @param edgesRaw `src LONG, dst LONG` (deduped internally)
    * @param seeds seed vertex ids (must be nonempty; a seed absent from
    *   the graph still yields its own restart-only vector)
    * @param k fixed iteration count
    * @param d damping factor
    * @return `seed LONG, id LONG, rank DOUBLE` — sparse (reached
    *   vertices only), Σ rank = 1 per seed
    */
  def run(
      edgesRaw: DataFrame,
      seeds: Seq[Long],
      k: Int,
      d: Double = 0.85): DataFrame = {
    require(seeds.nonEmpty, "need at least one seed")
    require(k >= 1, "k must be >= 1")
    val spark = edgesRaw.sparkSession
    import spark.implicits._
    val e = edgesRaw.select(col("src"), col("dst")).dropDuplicates()
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val outdeg = e.groupBy(col("src").as("id")).agg(count("*").as("outdeg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val seedDf = seeds.toDF("seed")
    var state = seedDf
      .select(col("seed"), col("seed").as("id"), lit(1.0).as("rank"))
      .transform(CacheScope.rotate)
    var prevCp: DataFrame = state
    for (_ <- 1 to k) {
      val next = iterate(e, outdeg, seedDf, state, d)
        .transform(CacheScope.rotate) // eager: truncates the per-iteration lineage
      prevCp.unpersist(false)
      prevCp = next
      state = next
    }
    val out = state
    e.unpersist(false)
    outdeg.unpersist(false)
    out
  }

  /** One PPR iteration over the sparse (seed, id, rank) state — exposed
    * for the PlanSpec exchange audit: the state side exchanges to the
    * cached edge partitioning, the edge side never moves, and the
    * recombine is map-side combined.
    */
  private[graft] def iterate(
      e: DataFrame,
      outdeg: DataFrame,
      seedDf: DataFrame,
      state: DataFrame,
      d: Double): DataFrame = {
    val withDeg = state.join(outdeg, Seq("id"), "left_outer")
    // contributions along out-edges: rank·d/outdeg to each successor
    val contribs = withDeg
      .filter(col("outdeg").isNotNull)
      .join(e.withColumnRenamed("src", "id"), Seq("id"))
      .select(
        col("seed"), col("dst").as("id"),
        (col("rank") * d / col("outdeg")).as("c"))
    // per-seed dangling mass (rank parked on out-degree-0 vertices)
    // returns to the seed together with the restart mass
    val dangling = withDeg
      .filter(col("outdeg").isNull)
      .groupBy(col("seed"))
      .agg(sum(col("rank")).as("dmass"))
    val restart = seedDf
      .join(dangling, Seq("seed"), "left_outer")
      .select(
        col("seed"), col("seed").as("id"),
        (lit(1.0 - d) + lit(d) * coalesce(col("dmass"), lit(0.0)))
          .as("c"))
    contribs
      .unionByName(restart)
      .groupBy(col("seed"), col("id"))
      .agg(sum(col("c")).as("rank"))
  }
}
