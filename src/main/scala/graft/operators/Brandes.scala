package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sampled-source BETWEENNESS centrality (Brandes 2001, the k-source
  * approximation every real system runs — exact betweenness is
  * all-pairs): for each sampled seed, a forward BFS counts shortest
  * paths (`σ`), then the backward pass accumulates dependencies
  * `δ(v) = Σ_{w ∈ succ(v)} (σv/σw)·(1 + δw)` level by level;
  * betweenness is the seed-summed dependency, halved for the undirected
  * double-count. Depth-bounded (the κ-path/ego-betweenness variant) so
  * the whole computation — both passes — unrolls into a relational
  * oracle.
  *
  * Everything is deterministic: σ is an exact integer sum; the only
  * floats are the backward ratios, summed per (seed, vertex) and
  * rounded at 6 dp on the final output (the d23 float-sum discipline —
  * sub-ulp association noise sits 10 orders below the rounding grid).
  *
  * Scale shape: the symmetric edge frame is built, hash-partitioned by
  * `src`, and persisted ONCE; all `seeds` run BATCHED in one loop
  * (sparse (seed, id) state — the g26/g28 batching pattern), so each of
  * the ≤ 2·depth rounds is one state-sized join against the cached
  * edges + one map-side-combined aggregate, with per-round lineage cut.
  * Output: `id, bc_r` for every vertex with positive dependency.
  */
object Brandes {

  def sampledBetweenness(
      edges: DataFrame, seeds: Seq[Long], depth: Int): DataFrame =
    run(edges, seeds, depth, converge = false)._1

  /** [[sampledBetweenness]] run TO CONVERGENCE — the forward BFS stops
    * when the frontier EMPTIES (every seed's reachable set fully
    * levelled) instead of at a fixed depth, bounded by `maxDepth`
    * (the O14/O16 early-stop discipline its siblings g22b/g25b/g6b
    * carry). Past the stop level every deeper level is empty and
    * contributes nothing to the backward pass, so the converged result
    * equals the fixed-depth result for ANY depth ≥ the stop depth —
    * which keeps the unrolled oracle valid without the caller
    * hand-picking the eccentricity. Costs one |frontier|-count driver
    * action per level (the labelPropagationConverged cost model) on
    * top of the fixed-depth plan. Returns the betweenness frame plus
    * the depth at which the frontier emptied.
    */
  def sampledBetweennessConverged(
      edges: DataFrame, seeds: Seq[Long],
      maxDepth: Int = 64): (DataFrame, Int) =
    run(edges, seeds, maxDepth, converge = true)

  /** Sampled-source HARMONIC centrality (the closeness-family member —
    * Boldi & Vigna's harmonic variant, which stays finite on
    * disconnected graphs where classic closeness breaks):
    * `H(v) = Σ_{s ∈ seeds, s ≠ v, d(s,v) < ∞} 1 / d(s,v)`, run TO
    * CONVERGENCE (frontier-empty, the O14/O16 early-stop discipline)
    * bounded by `maxDepth`. Reuses [[sampledBetweenness]]'s batched
    * forward BFS verbatim — distance = the level a (seed, id) pair
    * first surfaces at, so the operator is the forward pass plus ONE
    * map-side-combined aggregate; levels past the stop are empty and
    * contribute nothing, keeping the fixed-depth unrolled oracle valid
    * for any depth ≥ the stop depth (the g45b argument). Output:
    * `id, harm_r` (6-dp rounded; one IEEE division per level, summed
    * per vertex — the d23 float-sum discipline).
    */
  def sampledHarmonic(
      edges: DataFrame, seeds: Seq[Long],
      maxDepth: Int = 64): (DataFrame, Int) = {
    // narrowed planning for tiny graphs — see [[run]]'s note
    PlanScope.narrowFor(edges) {
    val f = forward(edges, seeds, maxDepth, converge = true)
    val byLevel = f.levels.zipWithIndex.drop(1).map { case (lv, l) =>
      lv.select(col("seed"), col("id"), lit(l.toDouble).as("d"))
    }
    val out =
      if (byLevel.isEmpty)
        // edgeless graph: no (seed, id) pair at distance ≥ 1 — emit the
        // schema-stable empty frame rather than failing the reduce
        f.levels.head
          .select(col("id"), lit(0.0).as("harm_r")).limit(0)
      else
        byLevel.reduce(_ union _)
          .groupBy(col("id"))
          .agg(round(sum(lit(1.0) / col("d")), 6).as("harm_r"))
    (CacheScope.sealAfter(out, f.sym, f.ue), f.stopDepth)
    }
  }

  private case class Forward(
      levels: Seq[DataFrame], ue: DataFrame, sym: DataFrame, stopDepth: Int)

  private def run(
      edges: DataFrame, seeds: Seq[Long], depth: Int,
      converge: Boolean): (DataFrame, Int) = {
    // narrowed planning for tiny graphs (see PlanScope): σ counts are
    // integer sums and the δ accumulation is a per-(seed,vertex) sum of
    // doubles whose addend SET is partition-independent; at scale the
    // estimate keeps full width.
    PlanScope.narrowFor(edges) {
    val f = forward(edges, seeds, depth, converge)
    val levels = f.levels
    val sym = f.sym
    val ue = f.ue
    val stopDepth = f.stopDepth
    // backward: δ at the deepest level is 0; each shallower level sums
    // (σv/σw)(1+δw) over its successors at the next level
    var deltaNext = levels(stopDepth)
      .select(col("seed"), col("id"), lit(0.0).as("delta"))
      .transform(CacheScope.rotate)
    val deltas = scala.collection.mutable.ArrayBuffer(deltaNext)
    for (l <- (stopDepth - 1) to 0 by -1) {
      val cur = levels(l)
      val succ = cur
        .join(sym, cur("id") === sym("src"))
        .select(
          col("seed"), cur("id").as("vid"), col("sig").as("vsig"),
          col("dst").as("wid"))
        .join(
          levels(l + 1).select(
            col("seed"), col("id").as("wid"), col("sig").as("wsig")),
          Seq("seed", "wid"))
        .join(
          deltaNext.select(
            col("seed"), col("id").as("wid"), col("delta").as("wdelta")),
          Seq("seed", "wid"))
        .groupBy(col("seed"), col("vid"))
        .agg(sum(
          col("vsig").cast("double") / col("wsig") *
            (lit(1.0) + col("wdelta"))).as("delta"))
      val deltaCur = cur
        .join(
          succ.select(col("seed"), col("vid").as("id"), col("delta")),
          Seq("seed", "id"), "left_outer")
        .select(
          col("seed"), col("id"),
          coalesce(col("delta"), lit(0.0)).as("delta"))
        .transform(CacheScope.rotate)
      deltas += deltaCur
      deltaNext = deltaCur
    }
    val out = deltas.reduce(_ union _)
      .filter(col("delta") > 0)
      // a seed's own dependency never counts toward ITS walk — but the
      // same vertex accumulates normally from every other seed
      .filter(col("id") =!= col("seed"))
      .groupBy(col("id"))
      .agg(round(sum(col("delta")) / 2.0, 6).as("bc_r"))
    (CacheScope.sealAfter(out, sym, ue), stopDepth)
    }
  }

  /** The batched multi-source forward BFS both centralities share:
    * per level one frontier join against the src-partitioned persisted
    * symmetric edges + one map-side-combined σ aggregate, per-level
    * lineage rotation; with `converge` the loop stops when the frontier
    * empties (stopDepth = last non-empty level). The caller owns the
    * returned `ue`/`sym` persists (seal them with its result).
    */
  private def forward(
      edges: DataFrame, seeds: Seq[Long], depth: Int,
      converge: Boolean): Forward = {
    require(seeds.nonEmpty, "need at least one seed")
    require(depth >= 1, "depth must be >= 1")
    val spark = edges.sparkSession
    import spark.implicits._
    // persisted: sym consumes ue in BOTH union branches — unpersisted,
    // the edge-dedup shuffle would run twice when sym materializes
    val ue = edges
      .select(
        least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sym = ue.select(col("u").as("src"), col("v").as("dst"))
      .union(ue.select(col("v").as("src"), col("u").as("dst")))
      .repartition(col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // forward: visited (seed, id, d, sig); one frontier join per level
    val lvl0 = seeds.map(s => (s, s, 0, 1L))
      .toDF("seed", "id", "d", "sig").transform(CacheScope.rotate)
    val levels = scala.collection.mutable.ArrayBuffer(lvl0)
    var visitedKeys = lvl0.select(col("seed"), col("id")).transform(CacheScope.rotate)
    var frontier = lvl0
    var lvl = 1
    var drained = false
    while (lvl <= depth && !drained) {
      val newLevel = frontier
        .join(sym, frontier("id") === sym("src"))
        .select(col("seed"), col("dst").as("id"), col("sig"))
        .join(visitedKeys, Seq("seed", "id"), "left_anti")
        .groupBy(col("seed"), col("id"))
        .agg(sum(col("sig")).as("sig"))
        .select(col("seed"), col("id"), lit(lvl).as("d"), col("sig"))
        .transform(CacheScope.rotate) // eager: per-level lineage cut
      // convergence probe: the rotated level is materialized, so the
      // count is a cached-frame action, not a recompute
      if (converge && newLevel.isEmpty) {
        drained = true
      } else {
        levels += newLevel
        visitedKeys = visitedKeys
          .union(newLevel.select(col("seed"), col("id")))
          .transform(CacheScope.rotate)
        frontier = newLevel
        lvl += 1
      }
    }
    Forward(levels.toSeq, ue, sym, levels.size - 1)
  }
}
