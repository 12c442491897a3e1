package graft

import graft.operators._
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants over seeded random graphs (SURVEY.md
  * §5.2.4): mass conservation, rank lower bound, input-order invariance,
  * dedup idempotence, relabeling equivariance. Deterministic seeds (no
  * flaky reruns); the scalatest/scalacheck bridge isn't in the offline
  * cache, so generation is a seeded Random directly.
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  private def randomGraph(seed: Long): List[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    val n = 2 + rnd.nextInt(11)
    val m = 1 + rnd.nextInt(30)
    List.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
  }

  private def run(edges: List[(Long, Long)], k: Int = 3) = {
    val sp = spark
    import sp.implicits._
    PageRank.runFixed(spark, edges.toDF("src", "dst"), k)
  }

  private def ranksOf(edges: List[(Long, Long)]): Map[Long, Double] =
    run(edges).ranks.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  private val seeds = 1L to 6L

  test("ΣPR = 1 after every iteration; PR(v) ≥ (1−d)/N") {
    seeds.foreach { seed =>
      val res = run(randomGraph(seed))
      res.trace.foreach(st =>
        assert(math.abs(st.totalPR - 1.0) < 1e-9, s"seed=$seed"))
      val ranks = res.ranks.collect().map(_.getDouble(1))
      ranks.foreach(r =>
        assert(r >= 0.15 / ranks.length - 1e-12, s"seed=$seed"))
    }
  }

  test("edge input order does not change ranks") {
    seeds.foreach { seed =>
      val edges = randomGraph(seed)
      val a = ranksOf(edges)
      val b = ranksOf(new scala.util.Random(seed).shuffle(edges))
      assert(a.keySet == b.keySet, s"seed=$seed")
      a.foreach { case (k, v) =>
        assert(math.abs(v - b(k)) < 1e-12, s"seed=$seed id=$k")
      }
    }
  }

  test("duplicate edges do not change ranks (dedup idempotence)") {
    seeds.foreach { seed =>
      val edges = randomGraph(seed)
      val a = ranksOf(edges)
      val b = ranksOf(edges ++ edges.take(edges.length / 2))
      a.foreach { case (k, v) =>
        assert(math.abs(v - b(k)) < 1e-12, s"seed=$seed id=$k")
      }
    }
  }

  test("relabeling vertices permutes ranks equivariantly") {
    seeds.foreach { seed =>
      val edges = randomGraph(seed)
      val shift = 1000L
      val a = ranksOf(edges)
      val b = ranksOf(edges.map { case (s, d) => (s + shift, d + shift) })
      assert(a.keySet.map(_ + shift) == b.keySet, s"seed=$seed")
      a.foreach { case (k, v) =>
        assert(math.abs(v - b(k + shift)) < 1e-12, s"seed=$seed id=$k")
      }
    }
  }
}
