package graft

import graft.operators.Scc
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Strongly connected components (g31): hand-computed structures, the
  * ascending-chain worst case, and directionality (an undirected
  * components algorithm would merge everything here).
  */
class SccSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  private def scc(edges: Seq[(Long, Long)]): (Map[Long, Long], Int) = {
    val sp = spark
    import sp.implicits._
    val (df, rounds) = Scc.run(edges.toDF("src", "dst"))
    (df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap, rounds)
  }

  test("cycle with tail: the cycle is one SCC, tail vertices singletons") {
    // 1→2→3→1 cycle, 3→4→5 tail, 0→1 feeder
    val (got, _) = scc(Seq(
      (1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L), (0L, 1L)))
    assert(got == Map(
      0L -> 0L, 1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L))
  }

  test("two cycles bridged one-way stay distinct SCCs") {
    // {0,1} cycle → {2,3} cycle; the bridge is one-directional so they
    // must NOT merge (the weak-components answer would be one blob)
    val (got, _) = scc(Seq(
      (0L, 1L), (1L, 0L), (0L, 2L), (2L, 3L), (3L, 2L)))
    assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 2L, 3L -> 2L))
  }

  test("chains are consumed entirely by TRIM: zero settle rounds") {
    // a path has no cycles — every layer loses its in- or out-edge as
    // the previous one peels, so the cheap trim loop does all the work
    // and the fwd/bwd fixpoints never run (without trim each layer
    // would cost a full fixpoint pair: only the active minimum's SCC
    // satisfies fwd = bwd on a path)
    val (gotAsc, roundsAsc) = scc(Seq((2L, 1L), (1L, 0L)))
    assert(gotAsc == Map(0L -> 0L, 1L -> 1L, 2L -> 2L))
    assert(roundsAsc == 0, s"ascending: $roundsAsc")
    val (gotDesc, roundsDesc) = scc(Seq((0L, 1L), (1L, 2L)))
    assert(gotDesc == Map(0L -> 0L, 1L -> 1L, 2L -> 2L))
    assert(roundsDesc == 0, s"descending: $roundsDesc")
  }

  test("self-loops and duplicate edges are harmless") {
    val (got, _) = scc(Seq(
      (0L, 0L), (0L, 1L), (0L, 1L), (1L, 0L), (1L, 2L)))
    assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 2L))
  }

  test("gate fixture: 386 vertices labeled, giant SCC of 234, few rounds") {
    val e = graft.sources.SyntheticGraph.portable(spark, 400, 750, "g31")
    val (df, rounds) = Scc.run(e)
    val labels = df.collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(labels.length == 386)
    assert(labels.map(_._1).distinct.length == 386, "every vertex exactly once")
    val sizes = labels.groupBy(_._2).map(_._2.length)
    assert(sizes.max == 234, s"giant SCC ${sizes.max}")
    // trim consumes the singleton fringe; only the cyclic cores pay
    // fixpoint rounds (9 settle rounds before trim existed)
    assert(rounds <= 3, s"rounds=$rounds")
    // every label is a member of its own component (min-id rule)
    val byComp = labels.groupBy(_._2)
    assert(byComp.forall { case (lbl, vs) => vs.map(_._1).min == lbl })
  }
}
