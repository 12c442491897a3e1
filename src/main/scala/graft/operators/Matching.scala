package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** MAXIMAL MATCHING over the undirected simple graph by synchronous
  * LOCALLY-DOMINANT edge selection (the Preis / Manne–Bisseling
  * local-max family, deterministic form): every edge carries a
  * portable md5 rank; per round, an edge joins the matching iff its
  * rank is the MINIMUM among all surviving edges at BOTH endpoints
  * (two local minima cannot conflict — a vertex has one minimum), the
  * matched endpoints leave the graph, and the loop repeats on the
  * shrunken edge set until no edge survives. Hash ranks make rounds
  * behave like the random-priority analysis (O(log n) w.h.p.) where a
  * lexicographic rank would serialize a path graph into n/2 rounds;
  * determinism is kept because the rank is a pure function of the
  * edge, so the whole trajectory — every per-vertex minimum, every
  * dominance test, every removal — replays in a SQL oracle round for
  * round (matching accumulation is monotone, so converged ≡ fixed-k
  * for any k ≥ the stop depth, the g22b argument).
  *
  * Maximal matching is the pairing primitive of coarsening ladders
  * (METIS-style heavy-edge collapse pairs vertices before
  * contraction) and of allocation problems (one-to-one assignment
  * without a global auction); maximal ≠ maximum, but the local
  * guarantee (≥ ½ the maximum cardinality) is what distributed
  * systems actually run.
  *
  * Scale shape per round: the surviving edge frame streams into one
  * map-side-combined per-endpoint min aggregate (exchange ≤ |V|
  * partial rows), two |V|-sized equi-joins decide dominance, and two
  * anti-joins against the (≤ |V|-sized) matched-vertex frame shrink
  * the edge set; lineage is cut per round (CacheScope.rotate). No
  * stage is ever super-linear in |E|.
  */
object Matching {

  /** Run to EMPTY (every edge removed — the fixpoint; maximality is
    * structural: an edge could only survive with both endpoints
    * unmatched, and such an edge would still be in the working set).
    * Returns (`u, v, round` matched pairs, rounds run — the last
    * being the round that drained the set or proved it empty).
    */
  def maximalMatching(
      edges: DataFrame, maxRounds: Int = 100): (DataFrame, Int) =
    run(edges, maxRounds, stopWhenDrained = true)

  /** Fixed-round prefix of the same trajectory (oracle form). */
  def maximalMatchingRounds(edges: DataFrame, rounds: Int): DataFrame =
    run(edges, rounds, stopWhenDrained = false)._1

  /** ONE dominance round (pre-checkpoint), exposed for the PlanSpec
    * round audit: the per-endpoint rank minimum is a map-side-combined
    * hash aggregate (exchange ≤ |V| partials, never edge-sized), the
    * two dominance joins and the two matched-vertex anti-joins are
    * |V|-keyed. Returns (matched edges of this round, surviving edge
    * set).
    */
  private[graft] def matchingRound(
      e: DataFrame, round: Int): (DataFrame, DataFrame) = {
    val inc = e.select(col("u").as("vtx"), col("rk"))
      .union(e.select(col("v").as("vtx"), col("rk")))
      .groupBy(col("vtx")).agg(min(col("rk")).as("mn"))
    val m = e
      .join(inc.select(col("vtx").as("u"), col("mn").as("bu")), Seq("u"))
      .join(inc.select(col("vtx").as("v"), col("mn").as("bv")), Seq("v"))
      .filter(col("rk") === col("bu") && col("rk") === col("bv"))
      .select(col("u"), col("v"), lit(round).cast("long").as("round"))
    val mv = m.select(col("u").as("vtx"))
      .union(m.select(col("v").as("vtx")))
      .distinct()
    val nextE = e
      .join(mv.withColumnRenamed("vtx", "u"), Seq("u"), "left_anti")
      .join(mv.withColumnRenamed("vtx", "v"), Seq("v"), "left_anti")
    (m, nextE)
  }

  private def run(
      edges: DataFrame,
      maxRounds: Int,
      stopWhenDrained: Boolean): (DataFrame, Int) = {
    require(maxRounds >= 1, "maxRounds must be >= 1")
    // narrowed planning for tiny graphs (see PlanScope): the local-min
    // selection is a deterministic function of the md5 ranks, so the
    // matching is partition-count independent; at scale the estimate
    // keeps full width.
    PlanScope.narrowFor(edges) {
    // portable edge rank: md5("u:v") on the canonical pair — the
    // d12/d21 determinism discipline applied to edge priorities
    var e = GraphBuilder.undirectedSimple(edges)
      .select(col("u"), col("v"),
        md5(concat_ws(":", col("u"), col("v"))).as("rk"))
      .transform(CacheScope.rotate)
    var matched: DataFrame = null
    var prevMatched: DataFrame = null
    var rounds = 0
    var drained = false
    while (rounds < maxRounds && !drained) {
      val (m, nextE0) = matchingRound(e, rounds + 1)
      val nextMatched =
        (if (matched == null) m else matched.unionByName(m))
          .transform(CacheScope.rotate)
      val nextE = nextE0.transform(CacheScope.rotate)
      rounds += 1
      if (stopWhenDrained && nextE.isEmpty) drained = true
      if (prevMatched != null) prevMatched.unpersist(false)
      prevMatched = nextMatched
      e.unpersist(false)
      e = nextE
      matched = nextMatched
    }
    (matched, rounds)
    }
  }
}
