package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** LOUVAIN community detection — the modularity-gain local-move phase
  * (Blondel et al. 2008, "Fast unfolding of communities in large
  * networks"), in the SYNCHRONOUS, deterministic-tie formulation that a
  * distributed engine can actually run and another engine can replay
  * decision for decision (the parallel-Louvain family: Que et al.
  * IPDPS 2015 "Scalable community detection with the Louvain
  * algorithm"; the sequential textbook scan order is schedule-dependent
  * and cannot be certified cross-engine — the same argument as
  * [[GraphBuilder.labelPropagation]]'s synchronous LPA).
  *
  * Every vertex starts in its own community. Rounds alternate between
  * the two vertex-id parity classes (RED-BLACK relaxation — round r
  * activates `id % 2 == r % 2`); each ACTIVE vertex evaluates moving
  * to each NEIGHBORING community and takes the move with the largest
  * modularity gain if that gain is strictly positive (ties: largest
  * gain first, then SMALLEST target label). The alternation is what
  * makes the synchronous sweep converge: with all vertices active at
  * once, two adjacent vertices whose moves are each individually
  * ΔQ-positive can swap into each other's communities and 2-cycle
  * forever; activating one parity class at a time serializes adjacent
  * odd/even pairs while keeping every round a deterministic pure
  * function of the label frame. With Q = Σ_c [e_c/m − (D_c/2m)²] over the weighted
  * undirected graph (e_c = intra-community edge weight, D_c = total
  * weighted degree of c, m = total edge weight), the gain of moving v
  * from its community a to a neighboring community b, scaled by the
  * positive constant 2m², is the EXACT INTEGER
  *
  *   gain(v, b) = 2m·(k_vb − k_va) − k_v·(D_b − D_a + k_v)
  *
  * where k_vc = weight from v to community c (v's self-loops excluded —
  * they follow v wherever it goes and cancel in the difference), k_v =
  * v's weighted degree (self-loops counting twice, the A_ii = 2w
  * convention), and D_a includes v itself. Scaling by 2m² > 0 preserves
  * the argmax and sign, and makes every decision value an exact 64-bit
  * integer — no float enters any move decision, so a SQL oracle
  * replays the whole trajectory hash-exactly (the g29/g35 closed-form
  * discipline). Overflow bound: |gain| ≤ 2m·k_v + k_v·2m = 4m·k_v,
  * safe while m·k_v < 2³⁶·2²⁶ ≈ 2.3e18 — at 100 TB scale (m ~ 10¹²)
  * that allows hub degrees to ~10⁶; past that, rescale weights or
  * switch the decision value to DOUBLE (documented, not silently).
  *
  * Scale shape per round (the LPA/PageRank iteration class): one
  * |E|-row join of the once-partitioned symmetric adjacency against
  * the |V|-row label frame, one map-side-combined (vtx, lbl) weight
  * sum, then |cand|-row joins against |V|- and |C|-sized stat frames
  * (broadcast while they fit — statistics decide, no hints) and an
  * argmax that folds inside the hash aggregate via max_by — no window
  * over the candidate stream anywhere. Labels are rotated through
  * localCheckpoint per round (the PageRank loop's lineage discipline).
  *
  * The weighted-with-self-loops core is exactly what Louvain's
  * aggregation phase needs: [[GraphBuilder.coarsen]]'s output
  * (`lu, lv, n_edges` with `lu = lv` self-loop rows) feeds
  * [[moveRoundsWeighted]] directly, closing the multilevel loop with
  * gain moves at every level.
  *
  * BENCH-FIXTURE COST NOTE (r15 verdict, revised r16/r17 with a
  * measurement): on the 200-vertex gate fixtures each round costs
  * ~0.5-1 s of pure per-round overhead — Catalyst planning of the
  * ~8-join round plan, the localCheckpoint rotation job, and task
  * scheduling — not data (the whole graph fits in one task). The r17
  * A/B isolated the DOMINANT term as exchange WIDTH: planning every
  * round's ~6 exchanges at the session's 32 reducers schedules
  * hundreds of sub-millisecond tasks per round (53.5 s → 31.0 s for
  * the same converged ladder at ≤4 partitions, labels bit-identical —
  * the decision algebra is partition-count independent). Every entry
  * point therefore runs under [[PlanScope.narrowFor]], which narrows
  * the shuffle width to ~8k rows/reducer when Catalyst's estimate says
  * the graph is tiny and is the identity at real scale. The residual
  * fixed cost (planning + rotation) shrinks RELATIVELY at 100 TB (the
  * same plan amortizes over |E|-sized stages) and is the price of the
  * hash-locked oracle-replayable trajectory. Thinning the rotation
  * cadence would still not help: carrying k un-checkpointed rounds
  * multiplies the round plan's depth (and Catalyst's optimization
  * time) by k — it trades the checkpoint jobs for strictly slower
  * planning while changing no value.
  */
object Louvain {

  /** Canonical weighted undirected form of a directed edge list: the
    * simple graph's edges with weight 1 (duplicate directed edges and
    * orientation collapse, self-loops drop — the
    * [[GraphBuilder.undirectedSimple]] semantics every community
    * operator in this repo shares).
    */
  def fromEdges(edges: DataFrame): DataFrame =
    GraphBuilder.undirectedSimple(edges)
      .select(col("u"), col("v"), lit(1L).as("w"))

  /** FIXED-POINT RESCALE for fractional edge weights — the path forward
    * in front of [[louvainFrames]]'s loud integral-weight failure: a
    * similarity-weighted graph (d5 Jaccard estimates, e3 cosine scores —
    * the natural input when clustering a near-dup graph) carries weights
    * in (0, 1], and the exact integer gain algebra needs integers. Maps
    * `w → round(w · 10^decimals)` and RE-CHECKS the object Scaladoc's
    * overflow bound against the rescaled graph itself: the decision
    * value is bounded by `4·m·k_max`, so the helper computes the
    * rescaled total weight m and max weighted degree k_max (one setup
    * aggregate) and REQUIRES `4·m·k_max ≤ Long.MaxValue` in exact
    * BigInt arithmetic — too many decimals on a heavy graph fails
    * loudly at setup, never silently wraps a gain at round 7.
    *
    * Quantization contract: each weight moves by ≤ 0.5·10^-decimals
    * (absolute), so community structure is preserved whenever the
    * modularity gaps exceed the quantization scale — pick `decimals`
    * ≥ the precision of the similarity scores and the rounding is the
    * identity in spirit. Weights that round to ZERO (w < 0.5·10^-d)
    * are DROPPED with their edges: a sub-half-ulp similarity carries
    * no mass, and keeping the edge would make its endpoint a
    * spurious zero-weight move candidate the unquantized graph never
    * offered.
    */
  def rescaleWeights(wedges: DataFrame, decimals: Int = 6): DataFrame = {
    require(
      decimals >= 0 && decimals <= 15,
      "decimals must be in [0, 15] (10^d must stay an exact Long/Double)")
    val scale = math.pow(10.0, decimals)
    val scaled = wedges.select(
      col("u"), col("v"),
      round(col("w") * scale, 0).cast("long").as("w"))
      .filter(col("w") =!= 0L)
    // overflow re-check on the RESCALED graph (exact BigInt compare):
    // m = Σw, k_max = max weighted degree (self-loops count twice)
    val kw = scaled.select(
      col("u").as("id"),
      when(col("u") === col("v"), lit(2L) * col("w"))
        .otherwise(col("w")).as("kw"))
      .union(
        scaled.filter(col("u") =!= col("v"))
          .select(col("v").as("id"), col("w").as("kw")))
    val row = scaled.agg(coalesce(sum(col("w")), lit(0L))).first()
    val m = row.getLong(0)
    require(m > 0, "all weights rounded to zero — increase decimals")
    val kMax = kw.groupBy(col("id")).agg(sum(col("kw")).as("k"))
      .agg(max(col("k"))).first().getLong(0)
    require(
      BigInt(4) * BigInt(m) * BigInt(kMax) <= BigInt(Long.MaxValue),
      s"rescaled graph overflows the exact gain algebra: 4·m·k_max = " +
        s"4·${m}·${kMax} > 2^63−1 — lower `decimals` (quantize " +
        "coarser) so gains stay exact 64-bit integers")
    scaled
  }

  /** Fixed-round synchronous gain-move pass over a canonical weighted
    * undirected graph `wedges(u ≤ v, w)` (one row per undirected edge;
    * `u = v` rows are self-loops). Fixed rounds keep the trajectory
    * oracle-unrollable; a stable round is a fixpoint of the
    * deterministic update (decisions are a function of the labels
    * alone), so [[moveRoundsConverged]]'s result equals this one for
    * any `rounds` ≥ the stop depth. Returns `(id, lbl)`.
    */
  def moveRoundsWeighted(wedges: DataFrame, rounds: Int): DataFrame =
    runMoves(wedges, rounds, stopOnStable = false)._1

  /** [[moveRoundsWeighted]] run TO STABILITY (zero moves — the
    * O14/O16 early-stop discipline), bounded by `maxRounds`. Returns
    * the labels plus rounds run, the last being the no-op round that
    * proved stability (unless `maxRounds` cut it off first, which the
    * caller sees).
    */
  def moveRoundsConverged(
      wedges: DataFrame, maxRounds: Int = 20): (DataFrame, Int) =
    runMoves(wedges, maxRounds, stopOnStable = true)

  /** WARM-START gain-move pass (g58 — the g56/g57 incremental
    * discipline applied to Louvain): the level-0 community assignment
    * seeds from `init(id, lbl)` — yesterday's labels — instead of
    * singletons; vertices absent from the seed (new today) start as
    * their own singleton, and seed rows for vertices no longer in the
    * graph are simply never joined (community labels are opaque Longs,
    * nothing requires a label to name a live vertex).
    *
    * SOUNDNESS BOUNDARY (contrast with warm CC's grow-only rule):
    * edge ADDITIONS and REMOVALS are both warm-safe here — every gain
    * decision is a pure function of the current label frame, so a
    * stale seed can never corrupt an invariant the way a shrink-only
    * HashMin label can (hence no grow-only restriction). The honest
    * limit is OPTIMIZER-SHAPED instead: gain moves relocate one
    * vertex at a time and can merge communities but never SPLIT one,
    * so the result is a move-phase fixpoint AT LEAST AS COARSE as the
    * seed — seed from a prior run's labels (a fixpoint of a nearby
    * graph, the intended use) and the dynamics re-optimize freely;
    * seed a pathologically over-merged partition (e.g. everything in
    * one community) and it is already a fixpoint the move phase
    * cannot leave. Cold start from singletons is the finest partition
    * — the safe default when no trusted prior exists. Both halves are
    * spec-pinned in LouvainSpec; the converged-mode payoff
    * (warm-from-converged on a perturbed graph stabilizes in strictly
    * fewer rounds) is differential-locked there too.
    */
  def moveRoundsWeightedWarm(
      wedges: DataFrame, rounds: Int, init: DataFrame): DataFrame =
    runMoves(wedges, rounds, stopOnStable = false, Some(init))._1

  /** [[moveRoundsWeightedWarm]] run TO STABILITY, bounded — the
    * converged-mode payoff of warm starts (fewer rounds to the
    * fixpoint). Returns (labels, rounds run).
    */
  def moveRoundsConvergedWarm(
      wedges: DataFrame,
      init: DataFrame,
      maxRounds: Int = 20): (DataFrame, Int) =
    runMoves(wedges, maxRounds, stopOnStable = true, Some(init))

  /** Unweighted convenience: [[fromEdges]] + [[moveRoundsWeighted]]. */
  def moveRounds(edges: DataFrame, rounds: Int): DataFrame =
    moveRoundsWeighted(fromEdges(edges), rounds)

  /** WEIGHTED community contraction — Louvain's aggregation phase over
    * a weighted graph (the weight-carrying generalization of
    * [[GraphBuilder.coarsen]], which counts simple edges): every
    * community becomes a supervertex, edge weights between communities
    * sum, and `lu = lv` self-loop rows accumulate each community's
    * intra-weight (including member self-loops) — exactly the input
    * [[moveRoundsWeighted]] needs for the next level. One |E|-row
    * double label lookup (broadcast while the label frame fits) + one
    * map-side-combined (lu, lv) sum; output is |C|²-bounded and
    * near-linear in |C| in practice.
    */
  def contractWeighted(wedges: DataFrame, labels: DataFrame): DataFrame = {
    val lbl = labels.select(col("id"), col("lbl"))
    wedges
      .join(lbl.select(col("id").as("u"), col("lbl").as("la")), Seq("u"))
      .join(lbl.select(col("id").as("v"), col("lbl").as("lb")), Seq("v"))
      .groupBy(
        least(col("la"), col("lb")).as("u"),
        greatest(col("la"), col("lb")).as("v"))
      .agg(sum(col("w")).as("w"))
  }

  /** MULTILEVEL Louvain: `levels` × (gain-move rounds → contract),
    * labels projected back through every level so the result labels
    * the ORIGINAL vertices. Fixed `roundsPerLevel` keeps the whole
    * trajectory oracle-unrollable; each level runs on a graph
    * |communities| wide (the point of contraction — level 2+ cost is
    * driven by the community count, not |V|). Returns `(id, lbl)` on
    * the input graph's vertex set.
    */
  def multilevel(
      edges: DataFrame, roundsPerLevel: Int, levels: Int): DataFrame = {
    require(levels >= 1, "levels must be >= 1")
    var w = fromEdges(edges)
    var mapping: DataFrame = null
    PlanScope.narrowFor(w) {
    for (_ <- 1 to levels) {
      val lab = moveRoundsWeighted(w, roundsPerLevel)
      mapping =
        if (mapping == null) lab
        else CacheScope.rotate(
          mapping
            .join(lab.select(col("id").as("lbl"), col("lbl").as("lbl2")),
              Seq("lbl"))
            .select(col("id"), col("lbl2").as("lbl")))
      w = contractWeighted(w, lab)
    }
    mapping
    }
  }

  /** [[multilevel]] with the LADDER DEPTH decided by the algorithm's
    * own stopping rule — the dimension a user cannot guess: the level
    * loop stops when a level's move phase makes ZERO moves (its labels
    * are the identity), because then the contraction is a no-op and
    * every further level would replay the same graph — Blondel et al.'s
    * own termination ("when no further improvement is possible"), the
    * O14/O16 discipline applied to the ladder. The identity check (one
    * count over the |V_level|-sized label frame per level) is
    * deliberately stricter than "no merges": a permutation fixpoint
    * with all-singleton communities would relabel the graph and could
    * re-tie-break downstream levels.
    *
    * Per-level ROUNDS stay a capped budget, honestly: each level runs
    * [[moveRoundsConverged]], which cuts early when stability is
    * reached (measured: the small contracted levels stabilize in 2–6
    * rounds), but on large noisy levels the SYNCHRONOUS dynamics can
    * churn in a limit cycle without ever reaching a zero-move round
    * (measured on the planted fixture: level 1 still moves ~45
    * labels/round at round 44, while exact-integer modularity climbs
    * then oscillates) — the known failure mode of parallel Louvain
    * sweeps (Que et al. IPDPS 2015 discuss the oscillation class;
    * red-black alternation removes only the ADJACENT 2-cycles).
    * `maxRoundsPerLevel` is therefore a real knob (an iteration budget,
    * like every capped loop here), not a convergence guess — and depth,
    * the expensive dimension (each level is a full move phase +
    * contraction), is self-determined.
    *
    * Oracle contract (the g52c lock, differential-pinned in
    * LouvainSpec): this run with budget R ≡ [[multilevel]](edges, R, L)
    * for ANY L ≥ the self-determined stop level — capped levels run
    * exactly R rounds in both, stabilized levels no-op their remaining
    * fixed rounds (a both-parities-quiet state is a fixpoint of the
    * alternating update), and post-stop levels replay identity.
    * @return (labels on the original vertex set, levels run — the last
    *   being the zero-move level that proved the ladder closed, unless
    *   `maxLevels` cut the loop first, which the caller sees)
    */
  def multilevelConverged(
      edges: DataFrame,
      maxRoundsPerLevel: Int = 20,
      maxLevels: Int = 10): (DataFrame, Int) = {
    require(maxLevels >= 1, "maxLevels must be >= 1")
    var w = fromEdges(edges)
    var mapping: DataFrame = null
    var level = 0
    var done = false
    PlanScope.narrowFor(w) {
    while (level < maxLevels && !done) {
      val lab = moveRoundsConverged(w, maxRoundsPerLevel)._1
      level += 1
      val moved = lab.filter(col("id") =!= col("lbl")).count()
      mapping =
        if (mapping == null) lab
        else CacheScope.rotate(
          mapping
            .join(lab.select(col("id").as("lbl"), col("lbl").as("lbl2")),
              Seq("lbl"))
            .select(col("id"), col("lbl2").as("lbl")))
      if (moved == 0L) done = true
      // rotate the (|C|²-bounded, small) contracted graph so the level
      // ladder's lineage stays flat at any depth
      else w = CacheScope.rotate(contractWeighted(w, lab))
    }
    (mapping, level)
    }
  }

  /** WARM multilevel ladder (g58b — [[multilevelConverged]] seeded at
    * level 0): the first move phase enters warm from `init` and stops
    * on its OWN stability (the identity-labels stop rule is meaningless
    * under a seed — a warmed fixpoint has `lbl ≠ id` almost everywhere,
    * so level 0 uses the zero-moves-both-parities rule instead); the
    * contracted levels then run the cold ladder unchanged, where the
    * identity check is again exact (every contracted level starts from
    * singleton supervertices). Depth counts every level INCLUDING the
    * warm one, so the caller sees the same budget semantics as cold.
    */
  def multilevelConvergedWarm(
      edges: DataFrame,
      init: DataFrame,
      maxRoundsPerLevel: Int = 20,
      maxLevels: Int = 10): (DataFrame, Int) = {
    require(maxLevels >= 1, "maxLevels must be >= 1")
    val w0 = fromEdges(edges)
    PlanScope.narrowFor(w0) {
    val lab0 = runMoves(w0, maxRoundsPerLevel, stopOnStable = true,
      Some(init))._1
    var mapping = lab0
    var w = CacheScope.rotate(contractWeighted(w0, lab0))
    var level = 1
    var done = false
    while (level < maxLevels && !done) {
      val lab = moveRoundsConverged(w, maxRoundsPerLevel)._1
      level += 1
      val moved = lab.filter(col("id") =!= col("lbl")).count()
      mapping = CacheScope.rotate(
        mapping
          .join(lab.select(col("id").as("lbl"), col("lbl").as("lbl2")),
            Seq("lbl"))
          .select(col("id"), col("lbl2").as("lbl")))
      if (moved == 0L) done = true
      else w = CacheScope.rotate(contractWeighted(w, lab))
    }
    (mapping, level)
    }
  }

  /** Fixed-budget warm ladder — the oracle-unrollable twin of
    * [[multilevelConvergedWarm]] (the [[multilevel]]/[[multilevelConverged]]
    * relationship, warm): level 0 runs exactly `roundsPerLevel` warm
    * rounds from `init`, each further level `roundsPerLevel` cold
    * rounds on the contraction.
    */
  def multilevelWarm(
      edges: DataFrame,
      init: DataFrame,
      roundsPerLevel: Int,
      levels: Int): DataFrame = {
    require(levels >= 1, "levels must be >= 1")
    var w = fromEdges(edges)
    var mapping: DataFrame = null
    PlanScope.narrowFor(w) {
    for (i <- 1 to levels) {
      val lab =
        if (i == 1) moveRoundsWeightedWarm(w, roundsPerLevel, init)
        else moveRoundsWeighted(w, roundsPerLevel)
      mapping =
        if (mapping == null) lab
        else CacheScope.rotate(
          mapping
            .join(lab.select(col("id").as("lbl"), col("lbl").as("lbl2")),
              Seq("lbl"))
            .select(col("id"), col("lbl2").as("lbl")))
      w = contractWeighted(w, lab)
    }
    mapping
    }
  }

  /** ONE synchronous gain-move round (pre-checkpoint), exposed so the
    * PlanSpec round audit can walk the executed plan: the cached
    * nbr-partitioned adjacency never re-exchanges (the |V|-row label
    * frame ships TO it, shuffle_hash pinned so the cached side streams
    * instead of re-sorting per round — the PageRank/CC loop
    * discipline) and the k_vc sum is map-side combined, so the round's
    * one |E|-scale stage exchanges combined partials only. The
    * DECISION joins after it operate on the ≤|cand|-sized candidate
    * stream against the |C|-sized community stats — in round 1 |C| =
    * |V| and those joins shuffle candidate-sized rows (the intrinsic
    * price of evaluating every vertex's neighborhood); as communities
    * merge, statistics/AQE collapse them to broadcasts. Returns (next
    * labels, the persisted candidate frame — caller unpersists after
    * the rotate).
    *
    * Round semantics (see the object Scaladoc): D_c + community size
    * feed the gain and the SINGLETON-SWAP GUARD
    * (Lu–Halappanavar–Kalyanaraman's minimum-label heuristic — two
    * singleton communities see symmetric positive gains and would
    * swap forever; restricting singleton→singleton moves to the
    * smaller label breaks the symmetry). RED-BLACK ALTERNATION:
    * round r activates `id % 2 == r % 2` — without it two ADJACENT
    * vertices whose moves are each ΔQ-positive on the current state
    * trade communities in a 2-cycle (both pathologies were observed
    * on a two-triangle fixture before the fixes). The gain argmax
    * folds inside the hash aggregate via max_by((gain, −lbl)) — no
    * candidate window anywhere.
    */
  private[graft] def louvainRound(
      und: DataFrame,
      kv: DataFrame,
      labels: DataFrame,
      m: Long,
      round: Int): (DataFrame, DataFrame) = {
    // D_c + community size per community — |V|-row join + agg, |C| rows
    val dc = labels.join(kv, Seq("id"))
      .groupBy(col("lbl"))
      .agg(sum(col("kv")).as("dc"), count(lit(1)).as("csize"))
    // k_vc: v's connection weight to each neighboring community — THE
    // |E|-scale stage of the round; everything after operates on the
    // (vtx, community) candidate stream
    val cand = und
      .join(
        labels.select(col("id").as("nbr"), col("lbl").as("clbl"))
          .hint("shuffle_hash"),
        Seq("nbr"))
      .groupBy(col("vtx"), col("clbl"))
      .agg(sum(col("w")).as("kvc"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // k_va: v's connection to its CURRENT community (0 when v has no
    // neighbor at home — e.g. a freshly-emptied singleton)
    val own = labels
      .join(
        cand.select(col("vtx").as("id"), col("clbl").as("lbl"),
          col("kvc").as("kva")),
        Seq("id", "lbl"), "left_outer")
      .select(col("id"), col("lbl"),
        coalesce(col("kva"), lit(0L)).as("kva"))
    val active = lit((round % 2).toLong)
    val gains = cand
      .join(own.withColumnRenamed("id", "vtx"), Seq("vtx"))
      .filter(pmod(col("vtx"), lit(2L)) === active)
      .filter(col("clbl") =!= col("lbl"))
      .join(kv.withColumnRenamed("id", "vtx"), Seq("vtx"))
      .join(dc.select(col("lbl").as("clbl"), col("dc").as("db"),
        col("csize").as("sb")), Seq("clbl"))
      .join(dc.select(col("lbl"), col("dc").as("da"),
        col("csize").as("sa")), Seq("lbl"))
      .filter(!(col("sa") === 1L && col("sb") === 1L &&
        col("clbl") > col("lbl")))
      .select(col("vtx"), col("clbl"),
        (lit(2L * m) * (col("kvc") - col("kva")) -
          col("kv") * (col("db") - col("da") + col("kv"))).as("gain"))
      .filter(col("gain") > 0L)
      .groupBy(col("vtx"))
      .agg(max_by(col("clbl"), struct(col("gain"), -col("clbl")))
        .as("new_lbl"))
    // chg rides the frame so the converged loop's stability count is a
    // scan of the checkpointed result, not a second |V|-row join+exchange
    val next = labels
      .join(gains.withColumnRenamed("vtx", "id"), Seq("id"), "left_outer")
      .select(
        col("id"), coalesce(col("new_lbl"), col("lbl")).as("lbl"),
        (col("new_lbl").isNotNull && col("new_lbl") =!= col("lbl"))
          .as("chg"))
    (next, cand)
  }

  /** The loop's once-built frames, exposed for the PlanSpec round
    * audit: canonical weighted edges, the symmetric non-self adjacency
    * (self-loops cancel in every gain difference — they never enter
    * candidate scoring) hash-partitioned by `nbr` and persisted so
    * each round's label fan-out reuses the exchange (the LPA adjacency
    * discipline), the weighted-degree frame (each non-self edge adds w
    * at both ends, a self-loop adds 2w — A_ii = 2w), and the total
    * edge weight m (a driver scalar; it multiplies into every gain as
    * a literal). Caller unpersists all three frames.
    */
  private[graft] def louvainFrames(
      wedges: DataFrame): (DataFrame, DataFrame, DataFrame, Long) = {
    // gains are exact 64-bit integers (see the object Scaladoc), so
    // weights must be integral — fail loudly instead of silently
    // truncating a fractional weight (all-sub-1 weights would collapse
    // to m = 0 with a misleading "empty graph")
    val we = wedges.select(col("u"), col("v"),
      when(col("w").cast("long").cast(wedges.schema("w").dataType)
        === col("w"), col("w").cast("long"))
        .otherwise(raise_error(concat(
          lit("Louvain requires integral edge weights (exact integer "),
          lit("gain algebra); got fractional w="),
          col("w").cast("string"),
          lit(" — pass the graph through Louvain.rescaleWeights first")))
          .cast("long"))
        .as("w"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val und = we.filter(col("u") =!= col("v"))
      .select(col("u").as("vtx"), col("v").as("nbr"), col("w"))
      .union(
        we.filter(col("u") =!= col("v"))
          .select(col("v").as("vtx"), col("u").as("nbr"), col("w")))
      .repartition(col("nbr"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val kv = we
      .select(col("u").as("id"),
        when(col("u") === col("v"), lit(2L) * col("w")).otherwise(col("w"))
          .as("kw"))
      .union(
        we.filter(col("u") =!= col("v"))
          .select(col("v").as("id"), col("w").as("kw")))
      .groupBy(col("id")).agg(sum(col("kw")).as("kv"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val m: Long = we.agg(coalesce(sum(col("w")), lit(0L))).first().getLong(0)
    (we, und, kv, m)
  }

  private def runMoves(
      wedges: DataFrame,
      maxRounds: Int,
      stopOnStable: Boolean,
      init: Option[DataFrame] = None): (DataFrame, Int) = {
    require(maxRounds >= 1, "maxRounds must be >= 1")
    PlanScope.narrowFor(wedges) {
    val (we, und, kv, m) = louvainFrames(wedges)
    require(m > 0, "empty graph")

    // cold: every vertex its own singleton; warm: seed labels joined
    // onto THIS graph's vertex universe (new vertices → singleton,
    // departed seed rows never join)
    var labels = init match {
      case None => kv.select(col("id"), col("id").as("lbl"))
        .transform(CacheScope.rotate)
      case Some(seed) => kv.select(col("id"))
        .join(seed.select(col("id"), col("lbl")), Seq("id"), "left_outer")
        .select(col("id"), coalesce(col("lbl"), col("id")).as("lbl"))
        .transform(CacheScope.rotate)
    }
    var iters = 0
    var stable = false
    var prevQuiet = false
    var prev: DataFrame = labels
    while (iters < maxRounds && !stable) {
      val (next0, cand) = louvainRound(und, kv, labels, m, iters + 1)
      // the per-round chg flag checkpoints WITH the labels, so the
      // stability count below scans the materialized frame instead of
      // paying a |V|-row join+exchange per round
      val nextFull = next0.transform(CacheScope.rotate)
      val next = nextFull.select(col("id"), col("lbl"))
      iters += 1
      if (stopOnStable) {
        val changed = nextFull.filter(col("chg")).count()
        // a fixpoint needs BOTH parity classes quiet: one zero-move
        // round only proves the currently-active class is settled
        if (changed == 0L && prevQuiet) stable = true
        prevQuiet = changed == 0L
      }
      cand.unpersist(false)
      prev.unpersist(false)
      prev = nextFull
      labels = next
    }
    we.unpersist(false)
    und.unpersist(false)
    kv.unpersist(false)
    (labels, iters)
    }
  }
}
