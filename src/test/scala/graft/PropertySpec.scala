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

  test("simhash is token-order invariant (vote sums commute)") {
    val sp = spark
    import sp.implicits._
    seeds.foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val words = List.fill(12)(rnd.alphanumeric.take(4).mkString)
      val d = Seq(
        (1L, words.mkString(" "), "en", "s", 1L),
        (2L, rnd.shuffle(words).mkString(" "), "en", "s", 1L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      val sig = Dedup.simhashSignatures(d).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(sig(1L) == sig(2L), s"seed=$seed")
    }
  }

  test("minhash signature: supersets only lower each component (min-agg)") {
    val sp = spark
    import sp.implicits._
    seeds.foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val words = List.fill(10)(rnd.alphanumeric.take(5).mkString)
      val extra = List.fill(4)(rnd.alphanumeric.take(5).mkString)
      val d = Seq(
        (1L, words.mkString(" "), "en", "s", 1L),
        (2L, (words ++ extra).mkString(" "), "en", "s", 1L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      val sigs = Dedup.minhashSignatures(d, k = 16).collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      // appending tokens preserves every existing 3-shingle, so doc 2's
      // shingle set is a superset of doc 1's — each min-hash component
      // can only decrease (min over a superset)
      sigs(1L).zip(sigs(2L)).foreach { case (a, b) =>
        assert(b <= a, s"seed=$seed: superset raised a min component")
      }
      assert(sigs(1L).length == 16 && sigs(2L).length == 16)
    }
  }

  test("kCore family: monotone in k/strength; converged ⊆ every fixed-round run") {
    val sp = spark
    import sp.implicits._
    seeds.foreach { seed =>
      val g = randomGraph(seed).toDF("src", "dst")
      def core(k: Int): Set[Long] =
        GraphBuilder.kCoreConverged(g, k)._1
          .collect().map(_.getLong(0)).toSet
      // higher k can only shrink the core
      val (c1, c2, c3) = (core(1), core(2), core(3))
      assert(c2.subsetOf(c1) && c3.subsetOf(c2), s"seed=$seed")
      // the converged 2-core is contained in ANY fixed-round peel of the
      // same k (fewer rounds can only leave extra vertices in)
      val fixed1 = GraphBuilder.kCore(g, k = 2, rounds = 1)
        .collect().map(_.getLong(0)).toSet
      assert(c2.subsetOf(fixed1), s"seed=$seed")
      // weighted peel at w=1 per edge-direction pair degenerates to a
      // strength = degree-count peel
      val gw = g.withColumn("w", org.apache.spark.sql.functions.lit(1.0))
      val wcore = GraphBuilder.kCoreWeighted(gw, minStrength = 2.0, rounds = 8)
        .collect().map(_.getLong(0)).toSet
      // strength counts BOTH directions of each undirected edge pair and
      // multi-edges separately, so it upper-bounds the simple 2-core
      assert(c2.subsetOf(wcore), s"seed=$seed c2=$c2 wcore=$wcore")
    }
  }

  test("heavyHitters: every returned count ≥ threshold and exact; none missed") {
    val sp = spark
    import sp.implicits._
    seeds.foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val words = List.fill(300)("w" + rnd.nextInt(30))
      val docs = words.grouped(9).zipWithIndex
        .map { case (g, i) => (i.toLong, g.mkString(" "), 0L) }.toSeq
        .toDF("doc_id", "text", "n_chars")
      val frac = 0.05
      val got = TextOps.heavyHitters(docs, frac)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val exact = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val thresh = math.ceil(frac * words.size).toLong
      val expected = exact.filter(_._2 >= thresh)
      assert(got == expected, s"seed=$seed")
    }
  }

  test("components: every pair's endpoints share a label; label is a member min") {
    val sp = spark
    import sp.implicits._
    seeds.foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val pairs = List.fill(8)(
        (rnd.nextInt(10).toLong, 10L + rnd.nextInt(10)))
      val df = pairs.toDF("id_a", "id_b")
      val comp = Dedup.componentsFromPairs(df).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      pairs.foreach { case (a, b) =>
        assert(comp(a) == comp(b), s"seed=$seed pair=($a,$b)")
      }
      comp.groupBy(_._2).foreach { case (label, members) =>
        assert(members.keys.min == label, s"seed=$seed label=$label")
      }
    }
  }

  test("harmonic centrality is bounded by the seed count (each seed gives <= 1)") {
    val sp = spark
    import sp.implicits._
    seeds.foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val es = List.fill(40)(
        (rnd.nextInt(15).toLong, rnd.nextInt(15).toLong))
        .filter { case (a, b) => a != b }.distinct
      if (es.nonEmpty) {
        val sd = es.flatMap(e => Seq(e._1, e._2)).distinct.sorted.take(3)
        val h = graft.operators.Brandes
          .sampledHarmonic(es.toDF("src", "dst"), sd, maxDepth = 64)._1
          .collect().map(r => r.getLong(0) -> r.getDouble(1))
        h.foreach { case (v, hv) =>
          // d(s,v) >= 1 for every contributing seed, so each seed adds
          // at most 1.0 — the bound is tight only for a seed-adjacent v
          assert(hv > 0 && hv <= sd.length + 1e-9,
            s"seed=$seed vertex=$v H=$hv > |seeds|=${sd.length}")
        }
      }
    }
  }

  test("CMS estimates are monotone under corpus growth (counts only ever add)") {
    val sp = spark
    import sp.implicits._
    seeds.foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val vocab = (1 to 12).map(i => s"w$i")
      def doc(i: Long) =
        i -> List.fill(5 + rnd.nextInt(10))(vocab(rnd.nextInt(12)))
          .mkString(" ")
      val small = (0L until 6L).map(doc)
      val grown = small ++ (6L until 12L).map(doc)
      def est(c: Seq[(Long, String)]) =
        graft.operators.CountMin
          .pointEstimates(c.toDF("doc_id", "text"), depth = 3, width = 8)
          .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
      val a = est(small); val b = est(grown)
      for ((tok, e) <- a)
        assert(b(tok) >= e,
          s"seed=$seed token=$tok estimate shrank: ${b(tok)} < $e")
    }
  }
}
