package graft

import graft.operators.{Sampling, TemporalJoins, TextOps}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TemporalJoinsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  private def asof(
      probes: Seq[(Long, Long)], quotes: Seq[(Long, Long, String)]) = {
    val sp = spark
    import sp.implicits._
    TemporalJoins
      .asofJoin(
        probes.toDF("k", "pt"),
        quotes.toDF("k", "qt", "v"),
        key = "k", leftTs = "pt", rightTs = "qt", payload = Seq("v", "qt"))
      .collect()
      .map(r =>
        (r.getAs[Long]("k"), r.getAs[Long]("pt"), r.getAs[String]("v"),
          Option(r.getAs[java.lang.Long]("qt")).map(_.toLong)))
      .sortBy(t => (t._1, t._2))
      .toSeq
  }

  test("asofJoin picks latest quote at-or-before each probe, per key") {
    val out = asof(
      probes = Seq((1L, 10L), (1L, 25L), (2L, 10L)),
      quotes = Seq((1L, 5L, "a"), (1L, 20L, "b"), (2L, 50L, "z")))
    assert(out == Seq(
      (1L, 10L, "a", Some(5L)),
      (1L, 25L, "b", Some(20L)),
      (2L, 10L, null, None))) // quote strictly after probe ⇒ no match
  }

  test("asofJoin is inclusive: quote exactly at the probe instant wins") {
    val out = asof(
      probes = Seq((1L, 10L)),
      quotes = Seq((1L, 10L, "now"), (1L, 3L, "old")))
    assert(out == Seq((1L, 10L, "now", Some(10L))))
  }

  test("asofJoin keeps every probe row (left-outer semantics)") {
    val out = asof(probes = Seq((9L, 1L), (9L, 2L)), quotes = Seq())
    assert(out.map(_._3).forall(_ == null) && out.size == 2)
  }

  test("asofJoin: NULL payload in the latest quote is NOT backfilled from older rows") {
    val sp = spark
    import sp.implicits._
    val probes = Seq((1L, 30L)).toDF("k", "pt")
    // latest quote (qt=20) carries v=NULL, w=200; an older quote has
    // v='old'. ASOF semantics: BOTH payloads come from the qt=20 row —
    // v must surface as NULL, not torn-backfilled from qt=10.
    val quotes = Seq(
      (1L, 10L, Option("old"), Option(100L)),
      (1L, 20L, Option.empty[String], Option(200L)))
      .toDF("k", "qt", "v", "w")
    val out = TemporalJoins
      .asofJoin(probes, quotes, "k", "pt", "qt", payload = Seq("v", "w"))
      .collect()
    assert(out.length == 1)
    assert(out.head.isNullAt(out.head.fieldIndex("v")))
    assert(out.head.getAs[Long]("w") == 200L)
  }

  test("asofJoin rejects payload names colliding with left-side columns") {
    val sp = spark
    import sp.implicits._
    val probes = Seq((1L, 1L, "x")).toDF("k", "pt", "v")
    val quotes = Seq((1L, 1L, "y")).toDF("k", "qt", "v")
    val e = intercept[IllegalArgumentException] {
      TemporalJoins.asofJoin(probes, quotes, "k", "pt", "qt", Seq("v"))
    }
    assert(e.getMessage.contains("collide"))
  }

  test("bucketedRangeJoin matches across bucket boundaries exactly") {
    val sp = spark
    import sp.implicits._
    // width 10: probe [8, 18) spans buckets 0 and 1; matches 8,9,10,17
    // but not 7 (below) or 18 (half-open upper bound)
    val left = Seq((1L, 8L, 18L)).toDF("k", "lo", "hi")
    val right = Seq(7L, 8L, 9L, 10L, 17L, 18L).map((1L, _)).toDF("k", "t")
    val got = TemporalJoins
      .bucketedRangeJoin(left, right, "k", "lo", "hi", "t", bucketWidth = 10L)
      .select(col("t")).collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(8L, 9L, 10L, 17L))
  }

  test("bucketedRangeJoin equals naive theta join on random data") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(7)
    val left = Seq.tabulate(60)(i =>
      (rnd.nextInt(5).toLong, { val a = rnd.nextInt(500).toLong; a },
        i.toLong)).map { case (k, lo, id) =>
      (k, lo, lo + 1 + rnd.nextInt(50), id)
    }.toDF("k", "lo", "hi", "pid")
    val right = Seq.fill(300)(
      (rnd.nextInt(5).toLong, rnd.nextInt(600).toLong)).toDF("k", "t")
    val fast = TemporalJoins
      .bucketedRangeJoin(left, right, "k", "lo", "hi", "t", bucketWidth = 51L)
      .groupBy("pid").count().collect().map(r => (r.getLong(0), r.getLong(1)))
      .toMap
    val naive = left
      .join(right, Seq("k"))
      .filter(col("t") >= col("lo") && col("t") < col("hi"))
      .groupBy("pid").count().collect().map(r => (r.getLong(0), r.getLong(1)))
      .toMap
    assert(fast == naive)
  }

  test("bucketedRangeJoin fails fast on an interval wider than the bucket") {
    val sp = spark
    import sp.implicits._
    val left = Seq((1L, 0L, 100L)).toDF("k", "lo", "hi")
    val right = Seq((1L, 5L)).toDF("k", "t")
    val ex = intercept[Exception] {
      TemporalJoins
        .bucketedRangeJoin(left, right, "k", "lo", "hi", "t", 10L)
        .count()
    }
    assert(ex.getMessage.contains("bucketedRangeJoin") ||
      Option(ex.getCause).exists(_.getMessage.contains("bucketedRangeJoin")))
  }
}

class SamplingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  test("assignSplit is deterministic and ~90/5/5") {
    val sp = spark
    import sp.implicits._
    val docs = (0L until 10000L).toDF("doc_id")
    val counts = Sampling.assignSplit(docs)
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(counts("train") - 9000L) < 300)
    assert(math.abs(counts("val") - 500L) < 150)
    assert(math.abs(counts("test") - 500L) < 150)
    // decision is a pure function of (id, salt): any partitioning agrees
    val a = Sampling.assignSplit(docs).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val b = Sampling.assignSplit(docs.repartition(7)).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(a == b)
  }

  test("stratumCap keeps exactly cap rows per stratum, deterministically") {
    val sp = spark
    import sp.implicits._
    val docs = (0L until 400L).map(i => (i, s"s${i % 4}")).toDF("doc_id", "source")
    val capped = Sampling.stratumCap(docs, "source", cap = 10)
    val kept = capped.filter(col("kept") === 1)
      .groupBy("source").count().collect().map(_.getLong(1))
    assert(kept.length == 4 && kept.forall(_ == 10L))
    val a = capped.filter(col("kept") === 1).select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    val b = Sampling.stratumCap(docs.repartition(13), "source", cap = 10)
      .filter(col("kept") === 1).select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b)
  }

  test("simhash banded near-dup join equals brute force and finds planted dups") {
    val sp = spark
    import sp.implicits._
    import graft.operators.Dedup
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val docs = (Seq(
      (0L, base),
      (1L, base), //                  exact dup of 0 -> hamming 0
      (2L, base + " tail"), //        near dup
      (3L, "completely different content about spark catalyst plans")
    ) ++ (10L until 40L).map(i => (i, s"filler doc number $i with words " + ("x" + i) * 3)))
      .toDF("doc_id", "text")
    val banded = Dedup.simhashNearDupPairs(docs, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // brute force over the portable signatures
    val sigs = Dedup.simhashSignaturesPortable(docs)
    val brute = sigs.as("a").join(sigs.as("b"),
        org.apache.spark.sql.functions.col("a.doc_id") <
          org.apache.spark.sql.functions.col("b.doc_id"))
      .select(
        org.apache.spark.sql.functions.col("a.doc_id"),
        org.apache.spark.sql.functions.col("b.doc_id"),
        Dedup.hamming(
          org.apache.spark.sql.functions.col("a.simhash"),
          org.apache.spark.sql.functions.col("b.simhash")).cast("int"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .filter(_._3 <= 3).toSet
    assert(banded == brute)
    assert(banded.contains((0L, 1L, 0))) // exact dup found at distance 0
  }

  test("triangleCounts: direction, multi-edges and self-loops don't distort") {
    val sp = spark
    import sp.implicits._
    // triangle 1-2-3; pendant 3-4; noise: reversed dup edge, self-loop
    val e = Seq(
      1L -> 2L, 2L -> 3L, 1L -> 3L, 3L -> 4L,
      2L -> 1L, 1L -> 1L).toDF("src", "dst")
    val got = graft.operators.GraphBuilder.triangleCounts(e)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 0L))
  }

  test("triangleCounts: degree-ordered ≡ id-ordered on random and hub graphs") {
    // the two orientations list the same triangle set, so per-vertex
    // counts must agree exactly — on a uniform random graph AND on the
    // mid-id-hub skew fixture the degree ordering exists for
    val rand = graft.sources.SyntheticGraph.portable(spark, 120, 900, "g20t")
    val hub = graft.sources.SyntheticGraph.singleHub(
      spark, 2000L, 4000L, hubFrac = 0.1, seed = 91L, hubId = 1000L)
    for (g <- Seq(rand, hub)) {
      val deg = graft.operators.GraphBuilder.triangleCounts(g)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val id = graft.operators.GraphBuilder.triangleCountsIdOrdered(g)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(deg == id)
      assert(deg.values.sum > 0, "fixture must actually contain triangles")
    }
  }

  test("labelPropagation: cliques converge to min-id labels, bridge resists") {
    val sp = spark
    import sp.implicits._
    // two 4-cliques {1..4} and {10..13} joined by one bridge 4-10:
    // within a clique every vertex sees the clique's labels, so after
    // iteration 2 the min id dominates; the single bridge edge cannot
    // outvote 3 intra-clique neighbors
    val clique1 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val clique2 = for (a <- 10L to 13L; b <- (a + 1) to 13L) yield (a, b)
    val e = (clique1 ++ clique2 :+ (4L, 10L)).toDF("src", "dst")
    val got = graft.operators.GraphBuilder.labelPropagation(e, k = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 4L).forall(v => got(v) == 1L), s"clique1: $got")
    assert((10L to 13L).forall(v => got(v) == 10L), s"clique2: $got")
  }

  test("labelPropagation: isolated vertex keeps its id; ties pick min label") {
    val sp = spark
    import sp.implicits._
    // 5 is isolated (self-loop only); vertex 3 sees exactly one
    // neighbor of each label {1, 2} → tie, must adopt the SMALLER
    val e = Seq(1L -> 3L, 2L -> 3L, 5L -> 5L).toDF("src", "dst")
    val got = graft.operators.GraphBuilder.labelPropagation(e, k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(3L) == 1L, s"tie must break to min: $got")
    assert(got(5L) == 5L, s"isolated keeps id: $got")
  }

  test("kCore: pendant chain cascades out, clique survives with degrees") {
    val sp = spark
    import sp.implicits._
    // 4-clique {1..4} + chain 1-5-6: 6 peels in round 1 (deg 1), which
    // drops 5 to deg 1 → peels in round 2 (the cascade); the clique
    // keeps internal degree 3 throughout
    val clique = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val e = (clique ++ Seq((1L, 5L), (5L, 6L))).toDF("src", "dst")
    val got = graft.operators.GraphBuilder.kCore(e, k = 3, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L), s"$got")
    // k above the max core empties the graph
    assert(graft.operators.GraphBuilder.kCore(e, k = 4, rounds = 3).count() == 0)
  }

  test("shortestPaths: relaxation finds the cheap detour, bounds by rounds") {
    val sp = spark
    import sp.implicits._
    // 1→2 direct costs 10; 1→3→4→2 costs 1+1+1=3 but needs 3 rounds.
    // 9 is unreachable from 1 (edge points the wrong way: 9→1 only);
    // 5 hangs off 2 so its best cost tracks 2's.
    val e = Seq(
      (1L, 2L, 10.0), (1L, 3L, 1.0), (3L, 4L, 1.0), (4L, 2L, 1.0),
      (2L, 5L, 2.0), (9L, 1L, 1.0)).toDF("src", "dst", "w")
    val seed = Seq(Tuple1(1L)).toDF("id")
    def distMap(k: Int): Map[Long, Double] =
      graft.operators.ShortestPaths.run(e, seed, rounds = k)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val k1 = distMap(1)
    assert(k1 == Map(1L -> 0.0, 2L -> 10.0, 3L -> 1.0), s"k1: $k1")
    val k3 = distMap(3)
    assert(k3(2L) == 3.0, s"detour must win at k=3: $k3")
    assert(k3(5L) == 12.0 && !k3.contains(9L), s"k3: $k3")
    val k4 = distMap(4)
    assert(k4(5L) == 5.0, s"5 rides the detour at k=4: $k4")
    assert(k4(1L) == 0.0 && !k4.contains(9L))
  }

  test("chunkTokens: overlapping windows cover every token, blank docs drop") {
    val sp = spark
    import sp.implicits._
    // 7 tokens, chunkSize 4 / stride 2 → starts 0,2,4,6
    val docs = Seq(
      (1L, "a b c d e f g"), (2L, "x y"), (3L, "   ")).toDF("doc_id", "text")
    val got = graft.operators.TextOps.chunkTokens(docs, chunkSize = 4, stride = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getString(2), r.getLong(3)))).toMap
    assert(got == Map(
      (1L, 0L) -> (("a b c d", 4L)), (1L, 1L) -> (("c d e f", 4L)),
      (1L, 2L) -> (("e f g", 3L)), (1L, 3L) -> (("g", 1L)),
      (2L, 0L) -> (("x y", 2L))))
  }

  test("boilerplateStats: shared n-grams counted, unique docs keep") {
    val sp = spark
    import sp.implicits._
    // the 3-gram "spam spam spam" appears in docs 1-3 (df=3 ≥ minDf);
    // doc 4 shares nothing
    val docs = Seq(
      (1L, "spam spam spam alpha"), (2L, "beta spam spam spam"),
      (3L, "spam spam spam"), (4L, "one two three four")).toDF("doc_id", "text")
    val got = graft.operators.TextOps
      .boilerplateStats(docs, n = 3, minDf = 3, maxRatio = 0.5)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getInt(4)))).toMap
    // doc 1: grams {sss, ssa} → 1 boiler of 2 → ratio .5 → keep
    // doc 3: 1 of 1 → ratio 1 → culled
    assert(got(1L) == ((2L, 1L, 1)))
    assert(got(2L) == ((2L, 1L, 1)))
    assert(got(3L) == ((1L, 1L, 0)))
    assert(got(4L) == ((2L, 0L, 1)))
  }

  test("lmScore: add-one bigram log-probs, short docs absent") {
    val sp = spark
    import sp.implicits._
    // token stream a,b,a,b,a,b,z → cu(a)=3, cu(b)=3, cu(z)=1, V=3;
    // bigrams: ab ×3 (two in doc 1, one in doc 2), ba ×1
    // lp(ab) = ln(4/6), lp(ba) = ln(2/6)
    val docs = Seq(
      (1L, "a b a b"), (2L, "a b"), (3L, "z")).toDF("doc_id", "text")
    val got = graft.operators.TextOps.lmScore(docs)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    val ab = math.log(4.0 / 6.0)
    val ba = math.log(2.0 / 6.0)
    assert(got.keySet == Set(1L, 2L), s"short doc must be absent: $got")
    assert(got(1L)._1 == 3L && got(2L)._1 == 1L)
    assert(math.abs(got(1L)._2 - (2 * ab + ba) / 3.0) < 1e-6, s"$got")
    assert(math.abs(got(2L)._2 - ab) < 1e-6, s"$got")
  }

  test("decontaminate flags docs sharing n-grams with the benchmark") {
    val sp = spark
    import sp.implicits._
    val bench = Seq((100L, "the quick brown fox jumps")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "xx the quick brown fox yy"), // shares 4-grams 'the quick brown fox'/'quick brown fox jumps'? only the first
      (2L, "totally unrelated words here now")).toDF("doc_id", "text")
    val got = graft.operators.Dedup.decontaminate(corpus, bench, n = 4)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getInt(3)))).toMap
    assert(got(1L) == ((1L, 1))) // exactly one shared 4-gram
    assert(got(2L) == ((0L, 0)))
  }

  test("packSequences: per-shard offsets, seq boundaries, determinism") {
    val sp = spark
    import sp.implicits._
    val docs = Seq(
      (1L, "a b c", "s1"), (2L, "d e f g", "s1"), (3L, "h i", "s1"),
      (10L, "x y z w v", "s2")).toDF("doc_id", "text", "source")
    val got = graft.operators.Sampling.packSequences(docs, budget = 5)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // s1 stream: doc1 tokens 0-2, doc2 3-6, doc3 7-8 → seqs of 5 tokens
    assert(got(1L) == ((3L, 0L, 0L, 0L)))
    assert(got(2L) == ((4L, 3L, 0L, 3L)))
    assert(got(3L) == ((2L, 7L, 1L, 2L)))
    assert(got(10L) == ((5L, 0L, 0L, 0L)))
  }

  test("mixtureSample: realized rates track targets, default covers the rest") {
    val sp = spark
    import sp.implicits._
    // big synthetic id range so the uniform-hash concentration is visible
    val docs = sp.range(30000).select(
      col("id").as("doc_id"),
      concat(lit("w"), col("id")).as("text"),
      when(col("id") % 3 === 0, "a")
        .when(col("id") % 3 === 1, "b").otherwise("c").as("source"))
    val got = graft.operators.Sampling
      .mixtureSample(docs, Map("a" -> 0.2, "b" -> 0.7))
      .groupBy(col("source")).agg(avg(col("kept")).as("rate"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(got("a") - 0.2) < 0.02, s"a=${got("a")}")
    assert(math.abs(got("b") - 0.7) < 0.02, s"b=${got("b")}")
    assert(got("c") == 1.0, s"default ratio must keep everything: ${got("c")}")
    // determinism: same salt → identical keep set
    val k1 = graft.operators.Sampling.mixtureSample(docs, Map("a" -> 0.2))
      .filter(col("kept") === 1).agg(sum(col("doc_id"))).head.getLong(0)
    val k2 = graft.operators.Sampling.mixtureSample(docs, Map("a" -> 0.2))
      .filter(col("kept") === 1).agg(sum(col("doc_id"))).head.getLong(0)
    assert(k1 == k2)
  }

  test("trainingOrder: a permutation — every doc placed once, positions dense") {
    val sp = spark
    import sp.implicits._
    val docs = sp.range(1000).select(col("id").as("doc_id"))
    val got = graft.operators.Sampling.trainingOrder(docs, numShards = 4)
    assert(got.count() == 1000)
    assert(got.select(col("doc_id")).distinct().count() == 1000)
    // positions within each shard are 1..|shard| with no gaps
    val dense = got.groupBy(col("shard"))
      .agg(count("*").as("n"), max(col("pos")).as("mx"), min(col("pos")).as("mn"))
      .collect()
    dense.foreach { r =>
      assert(r.getLong(2) == r.getLong(1) && r.getLong(3) == 1L,
        s"shard ${r.getLong(0)} positions not dense")
    }
    // different seed ⇒ different permutation (overwhelmingly)
    val a = got.filter(col("shard") === 0).agg(sum(col("doc_id"))).head.getLong(0)
    val b = graft.operators.Sampling.trainingOrder(docs, 4, seed = "order-v2")
      .filter(col("shard") === 0).agg(sum(col("doc_id"))).head.getLong(0)
    assert(a != b)
  }

  test("packSequencePieces: boundary cuts reconstruct the shard stream") {
    val sp = spark
    import sp.implicits._
    // s1 stream: doc1 tokens 0-2, doc2 3-6, doc3 7-8; budget 5 ⇒ doc2
    // straddles the seq0/seq1 boundary and must split into two pieces
    val docs = Seq(
      (1L, "a b c", "s1"), (2L, "d e f g", "s1"), (3L, "h i", "s1"),
      (10L, "x y z w v", "s2")).toDF("doc_id", "text", "source")
    val rows = graft.operators.Sampling
      .packSequencePieces(docs, budget = 5).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getString(7)))
    // (doc, seq, piece_no, piece_start, piece_len, seq_offset, text)
    assert(rows.toSet == Set(
      (1L, 0L, 0L, 0L, 3L, 0L, "a b c"),
      (2L, 0L, 0L, 0L, 2L, 3L, "d e"),
      (2L, 1L, 1L, 2L, 2L, 0L, "f g"),
      (3L, 1L, 0L, 0L, 2L, 2L, "h i"),
      (10L, 0L, 0L, 0L, 5L, 0L, "x y z w v")))
    // every sequence reassembles exactly: pieces in seq_offset order,
    // budget-bounded, contiguous
    val seq0 = rows.filter(t => t._2 == 0L && Set(1L, 2L).contains(t._1))
      .sortBy(_._6).map(_._7).mkString(" ")
    assert(seq0 == "a b c d e")
  }

  test("minhashEstimatePairs: est=1 on identical docs, est=0 on disjoint docs") {
    val sp = spark
    import sp.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "s"),
      (2L, "alpha beta gamma delta epsilon zeta", "s"), // identical to 1
      (3L, "one two three four five six seven", "s")) //   disjoint
      .toDF("doc_id", "text", "source")
    val cands = Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b")
    val got = graft.operators.Dedup.minhashEstimatePairs(docs, cands)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getDouble(3)))).toMap
    // identical shingle sets: every per-seed min matches, exact j = 1
    assert(got((1L, 2L)) == ((1.0, 1.0)))
    // disjoint shingle sets: a per-seed min can only match via a SHARED
    // shingle (md5 collisions aside), so the estimate is exactly 0
    assert(got((1L, 3L)) == ((0.0, 0.0)))
  }

  test("knnBatch per-probe results equal single-probe knnToProbe") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val probes = Seq(0L, 7L)
    val batch = graft.operators.Similarity.knnBatch(emb, probes, k = 5)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(r => (r.getLong(1), r.getDouble(2))).toSet).toMap
    probes.foreach { p =>
      val single = graft.operators.Similarity.knnToProbe(emb, p, 5)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(batch(p) == single, s"probe $p disagreed")
    }
  }

  test("bfsHops: exact distances, unreached omitted, depth bound honored") {
    val sp = spark
    import sp.implicits._
    // 1→2→3→4 with shortcut 1→3; 5 only points INTO the component (so it
    // is unreachable from 1); 9 is a self-loop island
    val e = Seq(1L -> 2L, 2L -> 3L, 1L -> 3L, 3L -> 4L, 5L -> 1L, 9L -> 9L)
      .toDF("src", "dst")
    val got = graft.operators.GraphBuilder.bfsHops(e, source = 1L, maxHops = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L))
    val bounded = graft.operators.GraphBuilder.bfsHops(e, 1L, maxHops = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(bounded == Map(1L -> 0L, 2L -> 1L, 3L -> 1L))
  }

  test("geomean Aggregator equals exp(avg(ln))") {
    val sp = spark
    import sp.implicits._
    val df = Seq(("a", 2.0), ("a", 8.0), ("b", 5.0)).toDF("g", "x")
    val got = df.groupBy(col("g"))
      .agg(graft.functions.AggregatorFunctions.geomean(col("x")).as("gm"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(got("a") - 4.0) < 1e-12) // √(2·8)
    assert(math.abs(got("b") - 5.0) < 1e-12)
  }

  test("repeatedNgramStats counts duplicate 3-grams") {
    val sp = spark
    import sp.implicits._
    val docs = Seq(
      (1L, "a b a b a b"), // 4 3-grams, 2 distinct → ratio 0.5
      (2L, "x y"), //          too short → 0 n-grams
      (3L, "p q r") //         exactly one 3-gram
    ).toDF("doc_id", "text")
    val got = TextOps.repeatedNgramStats(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 4L, 2L, 0.5),
      (2L, 0L, 0L, 0.0),
      (3L, 1L, 1L, 0.0)))
  }
}
