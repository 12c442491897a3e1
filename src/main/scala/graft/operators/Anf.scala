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
    val e = edges.select(col("src"), col("dst"))
      .repartition(col("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val verts = GraphBuilder.vertices(edges)
    // S_u(0) = {u}: each single-row group aggregates its own id
    var state = verts
      .groupBy(col("id"))
      .agg(hll_sketch_agg(col("id"), lit(lgK)).as("sk"))
      .localCheckpoint()
    def sumEstimate(st: DataFrame): Long =
      st.agg(sum(hll_sketch_estimate(col("sk")))).first().getLong(0)
    val nf0 = sumEstimate(state)
    val trace = scala.collection.mutable.ListBuffer[(Long, Long)]((0L, nf0))
    var prev = nf0
    var plateau = false
    for (h <- 1 to maxH) {
      if (plateau) trace += ((h.toLong, prev))
      else {
        val contrib = e
          .join(state.withColumnRenamed("id", "dst"), Seq("dst"))
          .groupBy(col("src").as("id"))
          .agg(hll_union_agg(col("sk")).as("nsk"))
        val next = state
          .join(contrib, Seq("id"), "left_outer")
          .select(
            col("id"),
            when(col("nsk").isNull, col("sk"))
              .otherwise(hll_union(col("sk"), col("nsk"))).as("sk"))
          .localCheckpoint() // eager: truncates lineage, feeds the estimate
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
