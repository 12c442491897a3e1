package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate neighborhood function — the HyperBall/ANF algorithm
  * (Boldi–Rosa–Vigna, "HyperANF"; Palmer–Gibbons–Faloutsos, "ANF"):
  * N(h) = |{(u, w) : dist(u, w) ≤ h}| over the directed graph, computed
  * by iterating per-vertex cardinality sketches instead of per-vertex
  * reachability SETS:
  *
  *   S_u(0) = {u};   S_u(h) = S_u(h−1) ∪ ⋃_{(u,v)∈E} S_v(h−1)
  *
  * with each S_u carried as a HyperLogLog sketch (Spark's DataSketches
  * `hll_sketch_agg` / `hll_union` / `hll_sketch_estimate`). This is THE
  * way to get neighborhood growth / effective diameter at 100 TB: exact
  * per-vertex reachability state is Θ(|V|²) bits in the worst case,
  * while the sketch state is |V| · O(2^lgK) bytes FOREVER, and every
  * union is a constant-size merge. N(h) is then Σ_u estimate(S_u(h)).
  *
  * Plan shape per round (the PageRank loop discipline): the edge frame
  * is dst-partitioned and persisted ONCE; each round ships only the
  * |V|-row sketch state to it, merges neighbor sketches with ONE
  * map-side-combined `hll_union_agg`, left-outer recombines with the
  * previous state (sink vertices keep their sketch), and cuts lineage
  * with an eager localCheckpoint. One driver action per round reads the
  * round's Σ estimate — the same single-action-per-iteration cost the
  * convergence loops pay.
  *
  * Early stop: reachable sets only grow, so if NO vertex's estimate sum
  * changed between rounds the sketch state is a fixpoint and every later
  * N(h) equals the plateau — remaining rows are emitted without running
  * the join (in the sketches' exact regime this is exact; in the
  * probabilistic regime a sketch-state fixpoint still implies a constant
  * tail by monotonicity of the union).
  *
  * DETERMINISM: sketch union is commutative/associative and the sketch
  * state for a given input set is unique, so the result is reproducible
  * under any partitioning. While every per-vertex reachable set stays
  * within the sketch's exact (coupon) regime — |S| ≲ 2^lgK/4 — the
  * estimates are EXACT counts and N(h) equals the true neighborhood
  * function (the g30 gate fixture is sized for this, which is what lets
  * a recursive-CTE oracle hash-match a sketch algorithm); beyond it the
  * relative standard error is ≈ 1.04/√(2^lgK) (~1.6% at lgK = 12).
  *
  * Output: one row per h ∈ [0, maxH] — `h LONG, nf LONG` (a local
  * trace frame, like the g10/g13 iteration traces).
  */
object Anf {

  def neighborhoodFunction(
      edges: DataFrame, maxH: Int, lgK: Int = 12): DataFrame = {
    require(maxH >= 0, "maxH must be >= 0")
    val spark = edges.sparkSession
    // narrowed planning for tiny graphs (see PlanScope): HLL register
    // merges are max-per-register — order- and partition-independent —
    // so narrowing changes nothing but the scheduling bill; at scale
    // the estimate keeps full width.
    PlanScope.narrowFor(edges) {
    val e = edges.select(col("src"), col("dst"))
      .repartition(col("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val verts = GraphBuilder.vertices(edges)
    // S_u(0) = {u}: each single-row group aggregates its own id
    var state = verts
      .groupBy(col("id"))
      .agg(hll_sketch_agg(col("id"), lit(lgK)).as("sk"))
      .transform(CacheScope.rotate)
    def sumEstimate(st: DataFrame): Long =
      st.agg(sum(hll_sketch_estimate(col("sk")))).first().getLong(0)
    val nf0 = sumEstimate(state)
    val trace = scala.collection.mutable.ListBuffer[(Long, Long)]((0L, nf0))
    var prev = nf0
    var plateau = false
    for (h <- 1 to maxH) {
      if (plateau) trace += ((h.toLong, prev))
      else {
        val next = sketchRound(e, state)
          .transform(CacheScope.rotate) // eager: truncates lineage, feeds the estimate
        state.unpersist(false)
        state = next
        val nf = sumEstimate(state)
        trace += ((h.toLong, nf))
        if (nf == prev) plateau = true
        prev = nf
      }
    }
    state.unpersist(false)
    e.unpersist(false)
    import spark.implicits._
    trace.toSeq.toDF("h", "nf")
    }
  }

  /** Per-vertex HARMONIC CENTRALITY, depth-bounded — HyperBall's other
    * output (Boldi–Vigna: centrality from the same sketch recurrence
    * that yields N(h)): H(v) = Σ_{h=1..maxH} |ball(v,h) \ ball(v,h−1)|/h
    * — each newly-reached vertex contributes 1/its-distance. The ONLY
    * tractable centrality of this family at 100 TB: per-vertex exact
    * distance sets are Θ(|V|²); here each round's ball SIZE per vertex
    * is read off the sketch state the [[neighborhoodFunction]] loop
    * already maintains.
    *
    * The per-round ball sizes accumulate as columns of a |V|-row wide
    * frame (maxH joins of |V|-row frames, checkpoint-rotated); the
    * final score is the explicit left-associated chain
    * `(e1−e0)/1 + (e2−e1)/2 + …` so the float result is engine-portable
    * — in the sketches' exact regime the oracle recomputes every score
    * from exact distance counts and the top-N hash-matches. Output: the
    * top `topN` by (rounded centrality desc, id).
    */
  /** ONE sketch-diffusion round of the HyperBall recurrence, shared by
    * [[neighborhoodFunction]] and [[harmonicCentrality]] and exposed
    * (pre-checkpoint) for the PlanSpec exchange audit: the
    * dst-partitioned cached edge frame never re-exchanges — the |V|-row
    * sketch state ships TO it (shuffle_hash: the cached side streams,
    * no per-round re-sort), the neighbor-sketch merge folds map-side in
    * ONE hll_union_agg, and the left-outer recombine touches |V|-sized
    * frames only (sink vertices keep their sketch).
    */
  private[graft] def sketchRound(e: DataFrame, state: DataFrame): DataFrame = {
    val contrib = e
      .join(
        state.withColumnRenamed("id", "dst").hint("shuffle_hash"),
        Seq("dst"))
      .groupBy(col("src").as("id"))
      .agg(hll_union_agg(col("sk")).as("nsk"))
    state
      .join(contrib, Seq("id"), "left_outer")
      .select(
        col("id"),
        when(col("nsk").isNull, col("sk"))
          .otherwise(hll_union(col("sk"), col("nsk"))).as("sk"))
  }

  def harmonicCentrality(
      edges: DataFrame,
      maxH: Int,
      topN: Int,
      lgK: Int = 12): DataFrame = {
    require(maxH >= 1 && topN >= 1, "need maxH >= 1 and topN >= 1")
    // narrowed planning for tiny graphs — see [[neighborhoodFunction]]
    PlanScope.narrowFor(edges) {
    val e = edges.select(col("src"), col("dst"))
      .repartition(col("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val verts = GraphBuilder.vertices(edges)
    var state = verts
      .groupBy(col("id"))
      .agg(hll_sketch_agg(col("id"), lit(lgK)).as("sk"))
      .transform(CacheScope.rotate)
    def est(st: DataFrame, name: String): DataFrame =
      st.select(col("id"), hll_sketch_estimate(col("sk")).as(name))
    var wide = est(state, "e0").transform(CacheScope.rotate)
    for (h <- 1 to maxH) {
      val next = sketchRound(e, state)
        .transform(CacheScope.rotate)
      state.unpersist(false)
      state = next
      val w2 = wide.join(est(state, s"e$h"), Seq("id")).transform(CacheScope.rotate)
      wide.unpersist(false)
      wide = w2
    }
    state.unpersist(false)
    e.unpersist(false)
    val hExpr = (1 to maxH)
      .map(h => (col(s"e$h") - col(s"e${h - 1}")).cast("double") / h)
      .reduce(_ + _)
    wide
      .select(col("id"), round(hExpr, 6).as("harmonic"))
      .orderBy(desc("harmonic"), asc("id"))
      .limit(topN)
    }
  }
}
