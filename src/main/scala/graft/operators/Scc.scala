package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Strongly connected components by iterated forward/backward min-label
  * settling — the label formulation of FW-BW decomposition (Fleischer–
  * Hendrickson–Pinar's divide-and-conquer, collapsed to min-label
  * fixpoints the way distributed SCC engines run it):
  *
  *   fwd(v) = min{u : u →* v}   (min-label HashMin along edges)
  *   bwd(v) = min{w : v →* w}   (the same fixpoint on reversed edges)
  *
  * `fwd(v) = bwd(v) = r` proves `r →* v` and `v →* r`, i.e. v ∈ SCC(r) —
  * those vertices SETTLE with label r; the rest re-run on the shrinking
  * active subgraph (removing settled SCCs can only expose new
  * min-labels). Every settle round resolves at least the globally-
  * minimal active vertex's SCC, so termination is certain.
  *
  * TRIM (the standard FW-BW front-end): before each settle round,
  * vertices with no in-edge or no out-edge WITHIN the active subgraph
  * cannot lie on a cycle — they are singleton SCCs and peel off in a
  * cheap degree-only loop (two distinct-endpoint semi-joins per trim
  * round, no fixpoints). Trim alone consumes DAG-like regions — a pure
  * path needs ZERO settle rounds (unit-tested); without it every path
  * layer would cost a full fwd+bwd pair (only the active minimum's SCC
  * satisfies fwd = bwd on a path). `maxOuter` still guards adversarial
  * structures, and the operator fails loudly rather than ship a partial
  * labeling. The g31 gate fixture (400 v / 750 e: a 234-vertex giant
  * SCC, small cycles, singleton fringe) settles in 2 settle rounds.
  *
  * Scale shape: each inner HashMin round is the g15 components plan — the
  * from-partitioned persisted edge copy never re-exchanges, the |active|-row
  * label frame ships to it, the min-merge folds map-side, lineage is cut
  * per round (eager localCheckpoint), one driver count detects the
  * fixpoint (the O14/O16 early-stop discipline). The active subgraph is
  * re-derived per outer round with two survivor-sized semi-joins (the
  * kCore discipline); settled frames accumulate OUTSIDE the loop and
  * union at the end. All-integer labels ⇒ hash-exact across engines and
  * partitionings.
  */
object Scc {

  /** Returns `(labels, settleRounds)`: `labels` is `id LONG, scc LONG`
    * (scc = the component's minimum vertex id, the g15/d9 labeling
    * rule), one row per vertex of the edge set; `settleRounds` counts
    * the fwd/bwd fixpoint rounds run (trim rounds are not counted — a
    * DAG reports 0). Throws if `maxOuter` settle rounds fail to settle
    * every vertex — a silently-partial SCC labeling must never ship.
    */
  def run(
      edges: DataFrame,
      maxOuter: Int = 40,
      maxInner: Int = 100): (DataFrame, Int) = {
    require(maxOuter >= 1 && maxInner >= 1, "need positive round caps")
    // tiny-fixture loops plan at a narrowed shuffle width (the Louvain
    // r17 measurement: per-round cost is 32-wide task scheduling, not
    // data); identity at real scale, labels are exact integers so the
    // result is partition-count independent
    PlanScope.narrowFor(edges) {
    val e0 = edges.select(col("src"), col("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var active = GraphBuilder.vertices(e0).transform(CacheScope.rotate)
    var nActive = active.count()
    // seeded with an empty frame so a vertexless input returns an empty
    // (id, scc) frame instead of failing the final union
    val settled = scala.collection.mutable.ListBuffer[DataFrame](
      active.select(col("id"), col("id").as("scc")).limit(0))
    var outer = 0
    // active×active edge subgraph: two survivor-sized semi-joins — the
    // cached full edge frame streams, only `active` exchanges
    def activeEdges(act: DataFrame): DataFrame = e0
      .join(
        act.withColumnRenamed("id", "src").hint("shuffle_hash"),
        Seq("src"), "left_semi")
      .join(
        act.withColumnRenamed("id", "dst").hint("shuffle_hash"),
        Seq("dst"), "left_semi")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var ae = activeEdges(active)
    var aeFresh = true
    while (nActive > 0 && outer < maxOuter) {
      // TRIM to fixpoint: a vertex missing an in- or out-edge in the
      // active subgraph is a singleton SCC (cannot be on a cycle);
      // peeling it preserves every remaining SCC
      var trimming = true
      while (trimming && nActive > 0) {
        if (!aeFresh) { ae = activeEdges(active); aeFresh = true }
        val haveIn = ae.select(col("dst").as("id")).distinct()
        val haveOut = ae.select(col("src").as("id")).distinct()
        val keep = active
          .join(haveIn, Seq("id"), "left_semi")
          .join(haveOut, Seq("id"), "left_semi")
          .transform(CacheScope.rotate)
        val nKeep = keep.count()
        if (nKeep == nActive) trimming = false
        else {
          settled += active.join(keep, Seq("id"), "left_anti")
            .select(col("id"), col("id").as("scc"))
            .transform(CacheScope.rotate)
          ae.unpersist(false)
          aeFresh = false
          active = keep
          nActive = nKeep
        }
      }
      if (nActive > 0) {
        outer += 1
        val fwd = minLabelFixpoint(ae, active, reverse = false, maxInner)
          .withColumnRenamed("lbl", "f")
        val bwd = minLabelFixpoint(ae, active, reverse = true, maxInner)
          .withColumnRenamed("lbl", "b")
        val joined = fwd.join(bwd, Seq("id"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        settled += joined.filter(col("f") === col("b"))
          .select(col("id"), col("f").as("scc"))
          .transform(CacheScope.rotate)
        val nextActive = joined.filter(col("f") =!= col("b"))
          .select(col("id"))
          .transform(CacheScope.rotate)
        nActive = nextActive.count()
        joined.unpersist(false)
        ae.unpersist(false)
        aeFresh = false
        active = nextActive
      }
    }
    if (aeFresh) ae.unpersist(false)
    e0.unpersist(false)
    require(nActive == 0,
      s"SCC did not settle within $maxOuter settle rounds ($nActive left)")
    (settled.reduce(_ unionByName _), outer)
    }
  }

  /** HashMin to fixpoint over the (possibly reversed) active subgraph:
    * labels start as the vertex id; each round every vertex takes the
    * min of its own label and its in-neighbours' (out-neighbours' when
    * `reverse`), until no label changes.
    */
  private def minLabelFixpoint(
      edges: DataFrame,
      verts: DataFrame,
      reverse: Boolean,
      maxIter: Int): DataFrame = {
    val e = minLabelEdges(edges, reverse)
    var labels = verts.select(col("id"), col("id").as("lbl")).transform(CacheScope.rotate)
    var stable = false
    var it = 0
    while (!stable && it < maxIter) {
      val next = minLabelRound(e, labels)
        .transform(CacheScope.rotate) // eager: cuts lineage, feeds the change count
      it += 1
      val changed = next
        .join(labels.withColumnRenamed("lbl", "old"), Seq("id"))
        .filter(col("lbl") =!= col("old"))
        .count()
      labels = next
      if (changed == 0L) stable = true
    }
    e.unpersist(false)
    require(stable, s"HashMin did not converge within $maxIter rounds")
    labels
  }

  /** The (possibly reversed) propagation-oriented edge copy one SCC
    * inner fixpoint runs against: partitioned by the SENDING endpoint —
    * the label-join key — and persisted ONCE per fixpoint. (Round 8
    * shipped this partitioned by `to`, which satisfied the groupBy but
    * not the join: the cached edge frame re-exchanged on `from` every
    * round — exactly the failure mode the round audit exists to catch;
    * the audit caught it the round it landed.) Exposed so PlanSpec can
    * build the cached frame the audit walks.
    */
  private[graft] def minLabelEdges(
      edges: DataFrame, reverse: Boolean): DataFrame = {
    val (from, to) = if (reverse) ("dst", "src") else ("src", "dst")
    edges
      .select(col(from).as("from"), col(to).as("to"))
      .repartition(col("from"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  /** ONE HashMin round of [[minLabelFixpoint]], exposed (pre-checkpoint)
    * for the PlanSpec exchange audit: the from-partitioned cached edge
    * copy never re-exchanges — only the |active|-row label frame ships
    * to it (shuffle_hash: the cached side streams, no per-round
    * re-sort), and the min-merge folds map-side, so the per-`to`
    * exchange carries partial minima (≤ |V| rows per map partition),
    * never the edge-sized join output.
    */
  private[graft] def minLabelRound(
      e: DataFrame, labels: DataFrame): DataFrame = {
    val prop = e
      .join(
        labels.select(col("id").as("from"), col("lbl")).hint("shuffle_hash"),
        Seq("from"))
      .groupBy(col("to").as("id"))
      .agg(min(col("lbl")).as("in_lbl"))
    // |V|-sized recombine: shuffle_hash skips the per-round sort a
    // SortMergeJoin fallback would pay
    labels
      .join(prop.hint("shuffle_hash"), Seq("id"), "left_outer")
      .select(
        col("id"),
        least(col("lbl"), coalesce(col("in_lbl"), col("lbl"))).as("lbl"))
  }
}
