package graft

import graft.operators.{GraphBuilder, Louvain}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Louvain (g52/g52b): the red-black gain-move trajectory against
  * hand-computed decisions, converged ≡ fixed-round, weighted
  * contraction, and the Q-vs-LPA differentials the round-11 verdict
  * asked for.
  */
class LouvainSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  // two triangles {0,1,2} and {3,4,5} joined by the bridge 2–3; m = 7
  private def tiny: DataFrame = {
    val sp = spark
    import sp.implicits._
    Seq((0L, 1L), (1L, 2L), (0L, 2L), (3L, 4L), (4L, 5L), (3L, 5L),
      (2L, 3L)).toDF("src", "dst")
  }

  private def labelMap(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def q(edges: DataFrame, labels: DataFrame): Double =
    GraphBuilder.modularity(edges, labels)
      .select("q_r").first().getDouble(0)

  test("round 1 matches the hand-computed decisions (parity + guard)") {
    // active = odd ids. v1: c0 gain 14−4=10 (allowed, 0<1) beats c2
    //   gain 8 → 1→0. v3: c4/c5 blocked by the singleton guard
    //   (4,5 > 3); c2 gain 14−9=5 > 0 → 3→2. v5: c4 gain 14−4=10
    //   beats c3 gain 8 → 5→4. Even ids stay.
    assert(labelMap(Louvain.moveRounds(tiny, 1)) ==
      Map(0L -> 0L, 1L -> 0L, 2L -> 2L, 3L -> 2L, 4L -> 4L, 5L -> 4L))
  }

  test("three rounds settle the optimal two-triangle partition") {
    // round 2 (even): v2 leaves {2,3} for the triangle side (gain 11);
    // round 3 (odd): v3 follows the B-triangle (gain 16) — the exact
    // trajectory the oracle unrolls
    assert(labelMap(Louvain.moveRounds(tiny, 3)) ==
      Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 4L, 4L -> 4L, 5L -> 4L))
  }

  test("converged run stops after two quiet rounds and is a fixpoint") {
    val (lab, iters) = Louvain.moveRoundsConverged(Louvain.fromEdges(tiny))
    // moves end at round 3; rounds 4 and 5 are the quiet even+odd pair
    assert(iters == 5)
    assert(labelMap(lab) == labelMap(Louvain.moveRounds(tiny, 8)),
      "converged must equal any fixed k ≥ the stop depth")
    assert(math.abs(q(tiny, lab) - 0.357142857) < 1e-9)
  }

  test("singleton pair: guard blocks the swap, larger label joins smaller") {
    val sp = spark
    import sp.implicits._
    val e = Seq((8L, 7L)).toDF("src", "dst")
    val (lab, _) = Louvain.moveRoundsConverged(Louvain.fromEdges(e))
    assert(labelMap(lab) == Map(7L -> 7L, 8L -> 7L))
  }

  test("weighted contraction: intra weight becomes the self-loop") {
    val (lab, _) = Louvain.moveRoundsConverged(Louvain.fromEdges(tiny))
    val got = Louvain.contractWeighted(Louvain.fromEdges(tiny), lab)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((0L, 0L, 3L), (4L, 4L, 3L), (0L, 4L, 1L)))
  }

  test("multilevel on an already-optimal partition is a no-op level") {
    val single = labelMap(Louvain.moveRounds(tiny, 6))
    assert(labelMap(Louvain.multilevel(tiny, 6, 2)) == single,
      "the contracted 2-supernode graph must not merge (gain < 0)")
  }

  test("differential: Louvain beats LPA on the ER fixture") {
    val er = graft.sources.SyntheticGraph.portable(spark, 400, 1200, "g22")
    val qLpa = q(er, GraphBuilder.labelPropagation(er, 3))
    val qLouvain = q(er, Louvain.multilevel(er, 6, 3))
    assert(qLouvain > qLpa + 0.1,
      s"expected a decisive win on ER noise, got $qLouvain vs $qLpa")
  }

  test("differential: Louvain recovers the planted blocks, Q >= LPA") {
    val e = graft.sources.SyntheticGraph.portableBlocks(
      spark, 200, 600, "g22b")
    val qLpa = q(e, GraphBuilder.labelPropagation(e, 10))
    val lab = Louvain.multilevel(e, 8, 5)
    assert(lab.select("lbl").distinct().count() == 2,
      "5 levels must contract to the two planted blocks")
    assert(q(e, lab) >= qLpa - 1e-12, s"${q(e, lab)} vs $qLpa")
  }

  test("converged ladder on tiny: stops at the identity level, ≡ fixed") {
    val (lab, levels) = Louvain.multilevelConverged(
      tiny, maxRoundsPerLevel = 6, maxLevels = 8)
    // level 1 merges the triangles; level 2's move phase is identity
    // (the 2-supernode merge has negative gain) — the ladder's own stop
    assert(levels == 2)
    assert(labelMap(lab) == labelMap(Louvain.multilevel(tiny, 6, 2)))
    assert(labelMap(lab) == labelMap(Louvain.multilevel(tiny, 6, 4)),
      "post-stop levels of the fixed unroll must replay identity")
  }

  test("converged ladder recovers the planted blocks with NO depth hint") {
    val e = graft.sources.SyntheticGraph.portableBlocks(
      spark, 200, 600, "g22b")
    val (lab, levels) = Louvain.multilevelConverged(
      e, maxRoundsPerLevel = 8, maxLevels = 12)
    // self-determined depth (6 on this fixture), exact planted recovery
    assert(levels == 6, s"ladder self-stop moved: $levels")
    assert(lab.select("lbl").distinct().count() == 2)
    assert(math.abs(q(e, lab) - 0.499999639) < 1e-9)
    // the oracle contract: converged ≡ fixed at (same budget, L ≥ stop)
    assert(labelMap(lab) == labelMap(Louvain.multilevel(e, 8, 6)),
      "converged must equal the fixed unroll at the stop level")
  }

  test("warm seeded with singletons ≡ cold (same trajectory)") {
    val e = graft.sources.SyntheticGraph.portableBlocks(
      spark, 200, 600, "g22b")
    val we = Louvain.fromEdges(e)
    val ids = we.select(col("u").as("id"))
      .union(we.select(col("v").as("id"))).distinct()
    val singles = ids.select(col("id"), col("id").as("lbl"))
    assert(labelMap(Louvain.moveRoundsWeightedWarm(we, 4, singles)) ==
      labelMap(Louvain.moveRoundsWeighted(we, 4)))
  }

  test("warm: unseeded vertices start as singletons; stale rows ignored") {
    val sp = spark
    import sp.implicits._
    val we = Louvain.fromEdges(tiny)
    // seed covers only {0,1,2} (plus a departed vertex 99) — the
    // other triangle must behave exactly as cold-started
    val seed = Seq((0L, 0L), (1L, 0L), (2L, 0L), (99L, 7L))
      .toDF("id", "lbl")
    val (lab, _) = Louvain.moveRoundsConvergedWarm(we, seed)
    val m = labelMap(lab)
    assert(m(0L) == m(1L) && m(1L) == m(2L))
    assert(m(3L) == m(4L) && m(4L) == m(5L))
    assert(m(0L) != m(3L))
    assert(!m.contains(99L), "departed seed rows must not resurface")
  }

  test("warm boundary: an over-merged seed is a fixpoint (documented)") {
    // the move phase can merge but never SPLIT — seeding everything
    // into one community leaves the dynamics nowhere to go; this pins
    // the documented optimizer-shaped limit of warm starts
    val sp = spark
    import sp.implicits._
    val we = Louvain.fromEdges(tiny)
    val allOne = (0L to 5L).map(i => (i, 0L)).toDF("id", "lbl")
    val (lab, iters) = Louvain.moveRoundsConvergedWarm(we, allOne)
    assert(labelMap(lab).values.toSet.size == 1)
    assert(iters == 2, "two quiet parity rounds prove the fixpoint")
  }

  test("differential: warm-from-converged on a perturbed graph is faster") {
    // 20 rings of 6-cliques with bridges — a fixture whose move phase
    // genuinely CONVERGES from cold (the noisy planted fixture churns
    // in the documented level-0 limit cycle and never proves a
    // fixpoint inside any budget, so it cannot measure rounds-to-stop)
    val sp = spark
    import sp.implicits._
    val cliques = for {
      c <- 0 until 12; i <- 0 until 10; j <- (i + 1) until 10
    } yield ((c * 10 + i).toLong, (c * 10 + j).toLong)
    val bridges = (0 until 12).map(c =>
      ((c * 10).toLong, (((c + 1) % 12) * 10).toLong))
    val e = (cliques ++ bridges).toDF("src", "dst")
    val we = Louvain.fromEdges(e)
    // yesterday's graph: a small deterministic edge delta removed
    // (10 of 552 edges) — the daily-refresh shape; the delta must be
    // small relative to the graph (a rewired-half graph is a
    // different graph, not a refresh) and must leave yesterday's run
    // a TRUE fixpoint (prior below its cap), or the seed is junk
    val weOld = we.filter((col("u") + col("v")) % 51 =!= 0)
    val (prior, nPrior) = Louvain.moveRoundsConverged(weOld, 40)
    val (labCold, nCold) = Louvain.moveRoundsConverged(we, 40)
    val (labWarm, nWarm) = Louvain.moveRoundsConvergedWarm(we, prior, 40)
    assert(nPrior < 40, s"yesterday's run must converge: $nPrior")
    assert(nCold < 40, s"fixture must cold-converge: $nCold")
    assert(nWarm < nCold,
      s"warm must reach the fixpoint in strictly fewer rounds: " +
        s"$nWarm vs $nCold")
    assert(q(e, labWarm) >= q(e, labCold) - 1e-9,
      s"warm modularity ${q(e, labWarm)} vs cold ${q(e, labCold)}")
  }

  test("warm ladder: seeded from its own converged output is a fixpoint") {
    val sp = spark
    import sp.implicits._
    val cliques = for {
      c <- 0 until 12; i <- 0 until 10; j <- (i + 1) until 10
    } yield ((c * 10 + i).toLong, (c * 10 + j).toLong)
    val bridges = (0 until 12).map(c =>
      ((c * 10).toLong, (((c + 1) % 12) * 10).toLong))
    val e = (cliques ++ bridges).toDF("src", "dst")
    val (cold, coldLevels) = Louvain.multilevelConverged(e, 12, 8)
    val (warm, warmLevels) = Louvain.multilevelConvergedWarm(e, cold, 12, 8)
    def parts(df: org.apache.spark.sql.DataFrame) =
      labelMap(df).groupBy(_._2).values.map(_.keys.toSet).toSet
    assert(parts(warm) == parts(cold),
      "re-seeding the converged partition must reproduce it")
    assert(warmLevels <= coldLevels,
      s"warm ladder must not be deeper: $warmLevels vs $coldLevels")
  }

  test("warm ladder: fixed unroll ≡ converged at budget ≥ stop depth") {
    val sp = spark
    import sp.implicits._
    val cliques = for {
      c <- 0 until 12; i <- 0 until 10; j <- (i + 1) until 10
    } yield ((c * 10 + i).toLong, (c * 10 + j).toLong)
    val bridges = (0 until 12).map(c =>
      ((c * 10).toLong, (((c + 1) % 12) * 10).toLong))
    val e = (cliques ++ bridges).toDF("src", "dst")
    val we = Louvain.fromEdges(e)
    val prior = Louvain.moveRoundsConverged(
      we.filter((col("u") + col("v")) % 51 =!= 0), 40)._1
    val (conv, levels) = Louvain.multilevelConvergedWarm(e, prior, 12, 8)
    assert(labelMap(conv) ==
      labelMap(Louvain.multilevelWarm(e, prior, 12, levels)),
      "converged warm ladder must equal the fixed unroll at its depth")
  }

  test("budget robustness: a different per-level budget still recovers") {
    // the per-level rounds knob changes the trajectory, not the answer
    // on recoverable structure: budget 12 self-stops at its own depth
    // and finds the same planted 2-block partition
    val e = graft.sources.SyntheticGraph.portableBlocks(
      spark, 200, 600, "g22b")
    val (lab, levels) = Louvain.multilevelConverged(
      e, maxRoundsPerLevel = 12, maxLevels = 12)
    assert(levels <= 8)
    assert(lab.select("lbl").distinct().count() == 2)
    assert(math.abs(q(e, lab) - 0.499999639) < 1e-9)
  }
}
