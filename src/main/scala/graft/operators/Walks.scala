package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic random-walk corpus generation (the DeepWalk/node2vec
  * data-prep stage: walks ARE the training sentences a graph-embedding
  * model consumes, so this is the graph-side twin of the text-pipeline's
  * corpus builders).
  *
  * Every walk step is drawn by a PORTABLE md5 hash instead of an RNG —
  * `next = sortedNeighbors[ H(walk_id, step, salt) mod outdeg ]` — so the
  * whole corpus is reproducible under any partitioning, any cluster size,
  * and any other engine that can evaluate md5 (the d12/d21/d22 sampling
  * discipline applied to graph traversal; an oracle regenerates every
  * step with a row_numbered adjacency join). Walks stop early at dangling
  * vertices (no out-edges), mirroring how walk generators handle sinks
  * when teleport is off.
  *
  * Scale shape: the DEDUPED adjacency (src, sorted outlinks) is built and
  * hash-partitioned ONCE (one edge-sized exchange total); each of the
  * `len` steps is one join of the walk-state frame against it — the
  * exchange per step carries |walks| rows (one per live walk), NEVER
  * edge-sized rows, and the state only shrinks as walks hit sinks. The
  * path rides in the state row as a growing array (len is small and
  * bounded by contract), exploded once at the end; per-step lineage is
  * cut with the same eager localCheckpoint rotation as the PageRank loop.
  * At 100 TB the corpus cost is Σ_steps |walks| shuffled longs — the
  * minimum any per-walk sequential process pays.
  */
object Walks {

  /** One walk per vertex of `edges`' vertex universe, `len` steps (or
    * fewer where a walk reaches a sink). Output, exploded:
    * `walk_id LONG, step INT, vtx LONG` — step 0 is the start vertex.
    */
  def randomWalks(edges: DataFrame, len: Int, salt: String): DataFrame = {
    require(len >= 1, "len must be >= 1")
    // narrowed planning for tiny graphs (see PlanScope): steps are
    // deterministic hash draws — partition-count independent; at scale
    // the estimate keeps full width.
    PlanScope.narrowFor(edges) {
    // deduped directed adjacency, neighbors sorted ascending so the
    // modular index is well-defined cross-engine; self-loops are legal
    // walk steps and stay
    val adj = edges.select(col("src"), col("dst")).distinct()
      .groupBy(col("src"))
      .agg(array_sort(collect_list(col("dst"))).as("nbrs"))
      .repartition(col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val verts = GraphBuilder.vertices(edges)
    // state: (walk_id, cur, path); done walks (cur at a sink) leave the
    // live frame but keep their path in `done`
    var live = verts.select(
      col("id").as("walk_id"), col("id").as("cur"),
      array(col("id")).as("path"))
    // every step's checkpoint stays alive until the final seal: the
    // done-walk slices keep referencing it, and len is small by contract
    // (a walk corpus is tens of steps, not thousands) — blocks are freed
    // by the ContextCleaner once the sealed result drops the references
    val doneParts = scala.collection.mutable.ListBuffer[DataFrame]()
    for (step <- 1 to len) {
      val stepped = walkStep(adj, live, step, salt)
        .transform(CacheScope.rotate) // eager: truncates the per-step lineage
      doneParts += stepped.filter(col("next").isNull)
        .select(col("walk_id"), col("path"))
      live = stepped.filter(col("next").isNotNull)
        .select(
          col("walk_id"), col("next").as("cur"),
          concat(col("path"), array(col("next"))).as("path"))
    }
    val all = (doneParts :+ live.select(col("walk_id"), col("path")))
      .reduce(_ union _)
    val out = all
      .select(col("walk_id"), posexplode(col("path")).as(Seq("step", "vtx")))
    CacheScope.sealAfter(out, adj)
    }
  }

  /** WEIGHTED random walks — [[randomWalks]] with transition probability
    * ∝ integer edge weight (the node2vec/weighted-DeepWalk sampling
    * rule), still fully deterministic: the step draw is
    * `hmod = H(walk:step:salt) mod totalWeight(cur)` and the chosen
    * neighbor is the one whose cumulative-weight interval
    * `[cumw − w, cumw)` contains hmod — inverse-CDF sampling with an
    * integer CDF, so every engine lands on the same neighbor (no float
    * thresholds anywhere). Duplicate (src, dst) rows merge by summing
    * weights before the CDF is built.
    *
    * Same scale shape as the unweighted form: the adjacency (sorted
    * neighbor + cumulative-weight arrays per vertex, one window + one
    * aggregation) is built and partitioned ONCE; each step exchanges
    * |walks| rows, and the in-row neighbor pick is two codegen'd array
    * HOFs (filter-count + element_at). Output: `walk_id, step, vtx`.
    */
  def weightedRandomWalks(
      edges: DataFrame, len: Int, salt: String): DataFrame = {
    require(len >= 1, "len must be >= 1")
    // the CDF below is only a CDF if every edge weight is a positive
    // integer — a zero/negative weight yields non-monotonic cums (or a
    // non-positive totw feeding pmod) and silently corrupts the draw,
    // so the contract is ENFORCED, not assumed: one bounded
    // filter+limit probe of the edge frame (the node2vecWalks require,
    // lifted to data the driver can't see at call time)
    require(
      edges.filter(col("w") < 1).limit(1).isEmpty,
      "weightedRandomWalks requires integer edge weights >= 1 " +
        "(a w < 1 row was found)")
    // narrowed planning for tiny graphs — see [[randomWalks]]'s note
    PlanScope.narrowFor(edges) {
    import org.apache.spark.sql.expressions.Window
    val wCum = Window.partitionBy(col("src")).orderBy(col("dst"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // integer CDF per source: neighbors sorted by dst, cumw strictly
    // increasing (weights ≥ 1 by contract)
    val adj = edges
      .groupBy(col("src"), col("dst")).agg(sum(col("w")).as("w"))
      .withColumn("cumw", sum(col("w")).over(wCum))
      .groupBy(col("src"))
      .agg(sort_array(collect_list(struct(col("dst"), col("cumw"))))
        .as("dc"))
      .select(
        col("src"),
        transform(col("dc"), s => s.getField("dst")).as("nbrs"),
        transform(col("dc"), s => s.getField("cumw")).as("cums"))
      .withColumn("totw", element_at(col("cums"), -1))
      .repartition(col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val verts = GraphBuilder.vertices(edges)
    var live = verts.select(
      col("id").as("walk_id"), col("id").as("cur"),
      array(col("id")).as("path"))
    val doneParts = scala.collection.mutable.ListBuffer[DataFrame]()
    for (step <- 1 to len) {
      val stepped = weightedWalkStep(adj, live, step, salt)
        .transform(CacheScope.rotate) // eager: truncates the per-step lineage
      doneParts += stepped.filter(col("next").isNull)
        .select(col("walk_id"), col("path"))
      live = stepped.filter(col("next").isNotNull)
        .select(
          col("walk_id"), col("next").as("cur"),
          concat(col("path"), array(col("next"))).as("path"))
    }
    val all = (doneParts :+ live.select(col("walk_id"), col("path")))
      .reduce(_ union _)
    val out = all
      .select(col("walk_id"), posexplode(col("path")).as(Seq("step", "vtx")))
    CacheScope.sealAfter(out, adj)
    }
  }

  /** NODE2VEC second-order biased walks (Grover & Leskovec 2016): the
    * transition weight of candidate x from cur depends on the PREVIOUS
    * vertex — `retW` if x == prev (the 1/p return bias), `inW` if
    * x ∈ N(prev) (distance-1, the "stay local" BFS bias), `outW`
    * otherwise (distance-2, the 1/q DFS bias). Weights are INTEGERS
    * (rational p/q cleared to a common denominator by the caller), so
    * the inverse-CDF pick is exact integer arithmetic — the same
    * no-float-thresholds discipline as [[weightedRandomWalks]], and the
    * whole corpus is regenerable by an oracle that replays each step as
    * a candidate join + window cumsum.
    *
    * The first step has no prev and draws uniformly (all weights equal
    * — the standard node2vec start, and with equal weights the integer
    * CDF pick reduces EXACTLY to [[randomWalks]]' `H mod deg` draw).
    *
    * Scale shape: the sorted-neighbor adjacency is built and partitioned
    * ONCE; each step joins the |walks|-sized state against it TWICE (on
    * cur — co-partitioned — and on prev, a state-sized exchange) because
    * second-order bias needs both neighbor lists. The per-row CDF is
    * built by an array fold over cur's neighbors (O(deg²) element copies
    * — fine under the degree caps a walk corpus runs with; an
    * explode + window form trades it for a per-step exchange when
    * degrees are unbounded). Output: `walk_id, step, vtx`.
    */
  def node2vecWalks(
      edges: DataFrame, len: Int, salt: String,
      retW: Long = 1L, inW: Long = 4L, outW: Long = 2L): DataFrame = {
    require(len >= 1, "len must be >= 1")
    require(retW >= 1 && inW >= 1 && outW >= 1, "weights must be >= 1")
    // narrowed planning for tiny graphs — see [[randomWalks]]'s note
    PlanScope.narrowFor(edges) {
    val adj = edges.select(col("src"), col("dst")).distinct()
      .groupBy(col("src"))
      .agg(array_sort(collect_list(col("dst"))).as("nbrs"))
      .repartition(col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val verts = GraphBuilder.vertices(edges)
    var live = verts.select(
      col("id").as("walk_id"),
      lit(null).cast("long").as("prev"),
      col("id").as("cur"),
      array(col("id")).as("path"))
    val doneParts = scala.collection.mutable.ListBuffer[DataFrame]()
    for (step <- 1 to len) {
      val stepped = node2vecStep(adj, live, step, salt, retW, inW, outW)
        .transform(CacheScope.rotate) // eager: truncates the per-step lineage
      doneParts += stepped.filter(col("next").isNull)
        .select(col("walk_id"), col("path"))
      live = stepped.filter(col("next").isNotNull)
        .select(
          col("walk_id"),
          col("cur").as("prev"),
          col("next").as("cur"),
          concat(col("path"), array(col("next"))).as("path"))
    }
    val all = (doneParts :+ live.select(col("walk_id"), col("path")))
      .reduce(_ union _)
    val out = all
      .select(col("walk_id"), posexplode(col("path")).as(Seq("step", "vtx")))
    CacheScope.sealAfter(out, adj)
    }
  }

  /** One node2vec step: per-candidate integer weights from the
    * (prev, cur) pair, a leading-zero cumulative array built by ONE fold
    * (`cums0 = [0, c1, …, cn]`), and the pick
    * `idx = #(cums0 ≤ H mod totw)` — with the leading 0 always counted,
    * that is exactly the 1-based first-interval-containing-hmod index.
    * prev == NULL (step 1) makes every weight 1, reducing to the uniform
    * draw. Sinks surface `next = NULL`.
    */
  private[graft] def node2vecStep(
      adj: DataFrame, live: DataFrame, step: Int, salt: String,
      retW: Long, inW: Long, outW: Long): DataFrame = {
    val h = conv(
      substring(
        md5(concat_ws(":",
          col("walk_id").cast("string"), lit(step.toString), lit(salt))),
        1, 8),
      16, 10).cast("long")
    val padj = adj.select(col("src").as("psrc"), col("nbrs").as("pnbrs"))
    val ws = transform(col("nbrs"), x =>
      when(col("prev").isNull, lit(1L))
        .when(x === col("prev"), lit(retW))
        .when(array_contains(col("pnbrs"), x), lit(inW))
        .otherwise(lit(outW)))
    val cums0 = aggregate(ws, array(lit(0L)),
      (acc, w) => concat(acc, array(element_at(acc, -1) + w)))
    val totw = element_at(cums0, -1)
    val hmod = pmod(h, totw)
    val idx = size(filter(cums0, c => c <= hmod))
    live
      .join(adj, col("cur") === col("src"), "left_outer")
      .join(padj, col("prev") === col("psrc"), "left_outer")
      .select(
        col("walk_id"),
        col("cur"),
        when(col("nbrs").isNotNull, element_at(col("nbrs"), idx))
          .as("next"),
        col("path"))
  }

  /** One WEIGHTED walk step: `hmod = H mod totw`, neighbor index =
    * #(cums ≤ hmod) + 1 — the integer inverse-CDF pick, two codegen'd
    * array HOFs per live walk. Same exchange audit as [[walkStep]].
    */
  private[graft] def weightedWalkStep(
      adj: DataFrame, live: DataFrame, step: Int, salt: String): DataFrame = {
    val h = conv(
      substring(
        md5(concat_ws(":",
          col("walk_id").cast("string"), lit(step.toString), lit(salt))),
        1, 8),
      16, 10).cast("long")
    val hmod = pmod(h, col("totw"))
    live
      .join(adj, col("cur") === col("src"), "left_outer")
      .select(
        col("walk_id"),
        when(col("nbrs").isNotNull,
          element_at(col("nbrs"),
            (size(filter(col("cums"), c => c <= hmod)) + 1).cast("int")))
          .as("next"),
        col("path"))
  }

  /** One walk step: advance every live walk by its md5 draw —
    * `H(walk_id:step:salt)` is the first 8 md5 hex chars as an unsigned
    * 32-bit int (the portable-fixture hash, regenerable in any engine
    * with md5 + substring + base conversion), selecting the
    * `H mod outdeg`-th sorted neighbor. Walks at sinks surface
    * `next = NULL`. Plan-audited in PlanSpec: the cached src-partitioned
    * adjacency never re-exchanges — only the |walks|-sized state moves.
    */
  /** MONTE-CARLO personalized PageRank (the walk-endpoint estimator,
    * Fogaras et al. 2005) — the single-seed PPR method that actually
    * runs at 100 TB: `walks` independent α-geometric walks start at
    * `seed`, and est(v) = (walks ending at v) / walks. The working set
    * is `walks` rows that only ever touch the seed's reachable
    * neighborhood — the exact loop (g14/g26) iterates |V|-sized state
    * over the whole graph per seed. Fully deterministic: the per-step
    * STOP draw (20-bit md5(walk:step:salt:stop) ≥ α·2²⁰) and the
    * neighbor draw (the [[walkStep]] md5 rule) are both column
    * algebra, so any engine replays every walk — the estimate itself
    * is oracle-checkable, and its error vs the exact loop is a FIXED
    * number a differential test pins, never a flaky sample.
    *
    * A walk ends at its current vertex when the stop fires, or at
    * `maxSteps` (truncation mass α^maxSteps, documented). A continuing
    * walk on a SINK teleports to the seed — the same dangling rule as
    * the exact loop (g14/g26 send dangling mass back to the seed), so
    * the estimator targets the SAME stationary quantity and the only
    * differential error is sampling + truncation.
    * Output: `vtx LONG, n_end LONG, est DOUBLE(rounded 9)`.
    */
  def mcPersonalizedPageRank(
      edges: DataFrame,
      seed: Long,
      walks: Int,
      alpha: Double = 0.85,
      maxSteps: Int = 20,
      salt: String = "mcppr-v1"): DataFrame = {
    require(walks >= 1 && maxSteps >= 1, "walks and maxSteps must be >= 1")
    require(alpha > 0 && alpha < 1, "alpha must be in (0, 1)")
    val spark = edges.sparkSession
    // narrowed planning for tiny graphs — see [[randomWalks]]'s note
    PlanScope.narrowFor(edges) {
    val adj = edges.select(col("src"), col("dst")).distinct()
      .groupBy(col("src"))
      .agg(array_sort(collect_list(col("dst"))).as("nbrs"))
      .repartition(col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val thresh = (alpha * (1L << 20)).toLong
    var live = spark.range(walks.toLong)
      .select(col("id").as("walk_id"), lit(seed).as("cur"))
    val ends = scala.collection.mutable.ListBuffer[DataFrame]()
    for (step <- 1 to maxSteps) {
      val stopDraw = conv(
        substring(
          md5(concat_ws(":",
            col("walk_id").cast("string"), lit(step.toString), lit(salt),
            lit("stop"))),
          1, 5),
        16, 10).cast("long")
      val tagged = live.withColumn("_stop", stopDraw >= thresh)
      ends += tagged.filter(col("_stop")).select(col("cur").as("vtx"))
      val stepped = walkStep(
        adj,
        tagged.filter(!col("_stop"))
          .select(col("walk_id"), col("cur"), array(col("cur")).as("path")),
        step, salt)
        .select(col("walk_id"), col("next"))
        .transform(CacheScope.rotate)
      // a continuing walk on a sink teleports to the seed (the exact
      // loop's dangling rule) — no endpoint, the walk goes on
      live = stepped
        .select(col("walk_id"), coalesce(col("next"), lit(seed)).as("cur"))
    }
    ends += live.select(col("cur").as("vtx"))
    val out = ends.reduce(_ union _)
      .groupBy(col("vtx"))
      .agg(count(lit(1)).as("n_end"))
      .withColumn(
        "est", round(col("n_end").cast("double") / walks, 9))
    CacheScope.sealAfter(out, adj)
    }
  }

  private[graft] def walkStep(
      adj: DataFrame, live: DataFrame, step: Int, salt: String): DataFrame = {
    val h = conv(
      substring(
        md5(concat_ws(":",
          col("walk_id").cast("string"), lit(step.toString), lit(salt))),
        1, 8),
      16, 10).cast("long")
    live
      .join(adj, col("cur") === col("src"), "left_outer")
      .select(
        col("walk_id"),
        when(col("nbrs").isNotNull,
          element_at(col("nbrs"), (pmod(h, size(col("nbrs"))) + 1)
            .cast("int")))
          .as("next"),
        col("path"))
  }
}
