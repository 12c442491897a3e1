package graft

import graft.operators.{Sampling, Similarity, Walks}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 second wave: node2vec second-order walks (g41),
  * temperature-scaled mixture sampling (d32), filtered vector search
  * (e19), JSON schema-on-read (q32), dynamic partition pruning (q33 —
  * plan side in PlanSpec).
  */
class Node2vecSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  test("equal weights reduce exactly to the uniform first-order walk") {
    // with retW = inW = outW the integer CDF intervals are all equal
    // width and the pick degenerates to H mod deg — the whole corpus
    // must be bit-identical to randomWalks under the same salt
    val e = graft.sources.SyntheticGraph.portable(spark, 100, 300, "n2vdiff")
    val uni = Walks.randomWalks(e, len = 6, salt = "n2vdiff")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val n2v = Walks.node2vecWalks(e, len = 6, salt = "n2vdiff",
      retW = 1L, inW = 1L, outW = 1L)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(n2v == uni)
  }

  test("whole corpus matches an independent scalar reference walker") {
    // a driver-side reimplementation of the node2vec rule (md5 draw,
    // sorted candidates, second-order integer weights, inverse-CDF
    // pick) replays every walk over the collected graph — the full
    // exploded corpus must match exactly, exercising all three weight
    // classes on a graph with real return/in/out choices
    val e = graft.sources.SyntheticGraph.portable(spark, 50, 150, "n2vref")
    val (retW, inW, outW) = (1L, 4L, 2L)
    val got = Walks.node2vecWalks(e, len = 5, salt = "n2vref",
      retW = retW, inW = inW, outW = outW)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

    val edges = e.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val adj = edges.groupBy(_._1).view
      .mapValues(_.map(_._2).toSeq.sorted).toMap
    val verts = edges.flatMap(t => Seq(t._1, t._2))
    def h(walk: Long, step: Int): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$walk:$step:n2vref".getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.take(4).map("%02x".format(_)).mkString, 16)
    }
    val want = scala.collection.mutable.Set[(Long, Int, Long)]()
    for (v <- verts) {
      var path = Vector(v)
      var (prev, cur) = (Option.empty[Long], v)
      var alive = true
      for (step <- 1 to 5 if alive) {
        adj.get(cur) match {
          case None => alive = false
          case Some(nbrs) =>
            val ws = nbrs.map { x =>
              prev match {
                case None => 1L
                case Some(p) =>
                  if (x == p) retW
                  else if (adj.getOrElse(p, Seq()).contains(x)) inW
                  else outW
              }
            }
            val tot = ws.sum
            val hmod = ((h(v, step) % tot) + tot) % tot
            val cums = ws.scanLeft(0L)(_ + _).tail
            val idx = cums.indexWhere(_ > hmod)
            val next = nbrs(idx)
            path :+= next
            prev = Some(cur); cur = next
        }
      }
      path.zipWithIndex.foreach { case (x, i) => want += ((v, i, x)) }
    }
    assert(got == want.toSet)
  }

  test("walks stop at sinks and keep their truncated path") {
    val sp = spark
    import sp.implicits._
    val e = Seq((0L, 1L), (1L, 2L)).toDF("src", "dst") // 2 is a sink
    val got = Walks.node2vecWalks(e, len = 8, salt = "sink")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == Set(
      (0L, 0, 0L), (0L, 1, 1L), (0L, 2, 2L),
      (1L, 0, 1L), (1L, 1, 2L),
      (2L, 0, 2L)))
  }
}

class TemperatureSampleSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  test("α=0.5 flattens: the small source keeps a higher fraction") {
    val sp = spark
    import sp.implicits._
    // A has 100 docs, B has 4: shares √100:√2² = 10:2, so B's keep
    // probability 0.5·104·2/12/4 = 2.17 caps at 1 (threshold 2^20,
    // every doc kept) while A's is 0.5·104·10/12/100 ≈ 0.433
    val docs = ((0 until 100).map(i => (i.toLong, "A")) ++
      (100 until 104).map(i => (i.toLong, "B"))).toDF("doc_id", "source")
    val out = Sampling.temperatureSample(docs, targetFrac = 0.5).persist()
    try {
      val thrA = out.filter(col("source") === "A")
        .select(col("keep_threshold")).head().getLong(0)
      val thrB = out.filter(col("source") === "B")
        .select(col("keep_threshold")).head().getLong(0)
      assert(thrB == (1L << 20), s"capped source must keep all: $thrB")
      assert(thrA < thrB, s"flattening must favor the small source")
      val keptB = out.filter(col("source") === "B" && col("kept") === 1).count()
      assert(keptB == 4L, "threshold 2^20 exceeds every 20-bit draw")
    } finally { out.unpersist(); () }
  }

  test("uniform sources at targetFrac=1 keep everything exactly") {
    val sp = spark
    import sp.implicits._
    // equal counts ⇒ share = 1/S ⇒ p = N/(S·n) = 1 exactly
    val docs = ((0 until 6).map(i => (i.toLong, s"s${i % 3}")))
      .toDF("doc_id", "source")
    val out = Sampling.temperatureSample(docs, targetFrac = 1.0)
    assert(out.filter(col("kept") === 1).count() == 6L)
  }
}

class FilteredKnnSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("every returned neighbor satisfies the corpus predicate") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val got = Similarity.knnFiltered(
      emb, probeIds = Seq(0L, 1L, 2L), k = 5,
      corpusPred = col("label").isin(2, 7))
    val labels = got.join(emb.select(col("vec_id"), col("label")), Seq("vec_id"))
      .select(col("label")).distinct()
      .collect().map(_.getInt(0)).toSet
    assert(labels.subsetOf(Set(2, 7)), labels.toString)
  }

  test("a tautological predicate reproduces the unfiltered batched kNN") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val filt = Similarity.knnFiltered(
      emb, probeIds = Seq(0L, 1L, 2L), k = 5, corpusPred = lit(true))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val plain = Similarity.knnBatchAgg(emb, Seq(0L, 1L, 2L), k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(filt == plain)
  }
}

class MmrRerankSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  test("near-duplicate of the top hit is displaced by a diverse result") {
    val sp = spark
    import sp.implicits._
    // probe 0 = (1,0,0,0); 1 and 2 are near-identical high-relevance
    // twins; 3 is moderately relevant but orthogonal to them. Plain
    // top-2 is {1, 2}; MMR's second pick must be 3 (the twin's penalty
    // ≈ its relevance, the orthogonal result keeps its margin).
    val emb = Seq(
      (0L, Array(1f, 0f, 0f, 0f), 0),
      (1L, Array(0.9f, 0.1f, 0f, 0f), 0),
      (2L, Array(0.9f, 0.11f, 0f, 0f), 0),
      (3L, Array(0.6f, 0f, 0.8f, 0f), 0),
      (4L, Array(0f, 0f, 0f, 1f), 0)
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.mmrRerank(emb, Seq(0L), shortlist = 4, k = 2)
      .orderBy(col("mmr_rank"))
      .collect().map(r => (r.getInt(3), r.getLong(1)))
    assert(got(0)._2 == 1L, got.mkString(","))
    assert(got(1)._2 == 3L, "rank 2 must diversify away from the twin: " +
      got.mkString(","))
  }

  test("λ=1 reduces to pure relevance: picks equal the exact top-k order") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val mmr = Similarity.mmrRerank(
      emb, Seq(0L, 1L), shortlist = 10, k = 4, lambda = 1.0)
      .collect()
      .map(r => (r.getLong(0), r.getInt(3), r.getLong(1)))
      .toSet
    val topk = Similarity.knnBatch(emb, Seq(0L, 1L), k = 10)
      .collect()
      .groupBy(_.getLong(0))
      .toSeq
      .flatMap { case (p, rows) =>
        rows.map(r => (r.getLong(1), r.getDouble(2)))
          .sortBy { case (id, sim) => (-sim, id) }
          .take(4).zipWithIndex
          .map { case ((id, _), i) => (p, i + 1, id) }
      }.toSet
    assert(mmr == topk)
  }

  test("each probe gets k distinct picks with ranks 1..k") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val rows = Similarity.mmrRerank(emb, Seq(0L, 1L, 2L), shortlist = 8, k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(3), r.getLong(1)))
    rows.groupBy(_._1).foreach { case (_, g) =>
      assert(g.map(_._2).sorted.toSeq == Seq(1, 2, 3))
      assert(g.map(_._3).distinct.length == 3, "picks must be distinct")
    }
  }
}

class LeakSafeSplitSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  test("every near-dup group lands in exactly one split; all docs covered") {
    val df = SparkEntry.queries("d33_leak_safe_split")(
      spark, "/root/testdata/sf0.001")
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    assert(df.count() == docs.count(), "every document must be assigned")
    val perGroup = df.groupBy(col("group_id"))
      .agg(countDistinct(col("split")).as("n_splits"))
    assert(perGroup.filter(col("n_splits") > 1).count() == 0,
      "a group straddles splits — leakage")
  }
}

class RecursiveChainSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  test("recursion walks each customer chain once, depth = position - 1") {
    val df = SparkEntry.queries("sql4_recursive_chain")(
      spark, "/root/testdata/sf0.001")
    val bad = df.groupBy(col("o_custkey"))
      .agg(
        count(lit(1)).as("n"),
        max(col("depth")).as("maxd"),
        countDistinct(col("o_orderkey")).as("nk"))
      .filter(col("maxd") =!= col("n") - 1 || col("nk") =!= col("n"))
    assert(bad.count() == 0,
      "each chain must visit every order exactly once, depth 0..n-1")
  }
}

class HashEmbedSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  test("embeddings are unit-norm (to rounding) and deterministic per text") {
    val sp = spark
    import sp.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma alpha"),
      (2L, "alpha beta gamma alpha"), // identical text, different id
      (3L, "delta"),
      (4L, "   "), // blank: dropped
      (5L, "epsilon zeta eta theta iota kappa")
    ).toDF("doc_id", "text")
    val got = graft.operators.TextOps.hashEmbed(docs, dim = 8)
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Double](1).toVector).toMap
    assert(!got.contains(4L), "blank text must be dropped")
    assert(got(1L) == got(2L), "same text must embed identically")
    got.values.foreach { v =>
      assert(v.length == 8)
      val n = math.sqrt(v.map(x => x * x).sum)
      assert(math.abs(n - 1.0) < 1e-4, s"not unit norm: $n")
    }
  }

  test("single-token doc embeds as ±1 one-hot at its hashed dimension") {
    val sp = spark
    import sp.implicits._
    val got = graft.operators.TextOps.hashEmbed(
      Seq((7L, "solo")).toDF("doc_id", "text"), dim = 8)
      .collect().head.getSeq[Double](1).toVector
    assert(got.count(x => math.abs(x) == 1.0) == 1)
    assert(got.count(_ == 0.0) == 7)
  }
}

class PerceptualNearDupSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  test("banded pairs equal the brute-force Hamming-≤1 set (100% recall)") {
    val media = graft.operators.Multimodal.syntheticMedia(
      spark, "/root/testdata/sf0.001")
    val sigs = graft.operators.Multimodal.perceptualSignatures(media)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    val brute = (for {
      (ia, sa) <- sigs; (ib, sb) <- sigs
      if ia < ib && Integer.bitCount(sa ^ sb) <= 1
    } yield (ia, ib, Integer.bitCount(sa ^ sb))).toSet
    val got = graft.operators.Multimodal.perceptualNearDupPairs(media)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == brute)
    assert(got.nonEmpty, "fixture has exact-dup texts: distance-0 pairs exist")
  }

  test("identical payloads collide at distance 0") {
    val sp = spark
    import sp.implicits._
    val media = Seq(
      (1L, "img", "same same payload bytes".getBytes("UTF-8")),
      (2L, "img", "same same payload bytes".getBytes("UTF-8")),
      (3L, "img", "completely different content here".getBytes("UTF-8"))
    ).toDF("media_id", "kind", "payload")
    val got = graft.operators.Multimodal.perceptualNearDupPairs(media)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.contains((1L, 2L, 0)), got.mkString(","))
  }
}

class PointInTimeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  private def ts(min: Long) = new java.sql.Timestamp(min * 60000L)

  test("probe sees the strict predecessor — never itself, never the future") {
    val sp = spark
    import sp.implicits._
    // user 1: view@1, purchase@2, click@3 — the probe (purchase@2) must
    // bind to view@1; user 2's FIRST event is a purchase → sentinels
    val ev = Seq(
      (10L, ts(1), 1L, "view", 1.5),
      (11L, ts(2), 1L, "purchase", 9.9),
      (12L, ts(3), 1L, "click", 2.5),
      (20L, ts(5), 2L, "purchase", 4.0),
      (21L, ts(6), 2L, "view", 0.5)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = graft.operators.TemporalJoins
      .pointInTimeState(ev, probeType = "purchase")
      .collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getString(4), r.getDouble(5)))
      .toSet
    assert(got == Set(
      (11L, 10L, "view", 1.5),
      (20L, -1L, "none", 0.0)), got)
  }

  test("same-timestamp tie: zero-width interval self-excludes") {
    val sp = spark
    import sp.implicits._
    // two events share ts(2); the probe at ts(4) must bind to the LAST
    // row of the tie (the one holding the open-ended interval)
    val ev = Seq(
      (30L, ts(2), 3L, "view", 1.0),
      (31L, ts(2), 3L, "click", 2.0),
      (32L, ts(4), 3L, "purchase", 5.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = graft.operators.TemporalJoins
      .pointInTimeState(ev, probeType = "purchase")
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
    assert(got == Set((32L, 31L)), got)
  }
}

class SkipgramPairsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  test("pair counts are symmetric: n(center=a, context=b) == n(b, a)") {
    val df = SparkEntry.queries("g43_skipgram_pairs")(
      spark, "/root/testdata/sf0.001")
    val m = df.collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(m.nonEmpty)
    m.foreach { case ((a, b), n) =>
      assert(m.getOrElse((b, a), 0L) == n,
        s"asymmetric pair counts at ($a,$b)")
    }
  }
}

class BpeMergesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  test("three hand-computed merge rounds on a tiny corpus") {
    val sp = spark
    import sp.implicits._
    // vocab: aaa×3, bb×1. Round 1: (a,a) counts 2 per 'aaa' ⇒ 6 vs
    // (b,b)=1 → merge (a,a); 'aaa' → [aa, a] (non-overlapping l2r).
    // Round 2: (aa,a)=3 beats (b,b)=1. Round 3: only (b,b)=1 remains.
    val docs = Seq((1L, "aaa bb aaa"), (2L, "aaa"))
      .toDF("doc_id", "text")
    val got = graft.operators.TextOps.bpeMerges(docs, k = 3)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSet
    assert(got == Set(
      (1, "a", "a", 6L),
      (2, "aa", "a", 3L),
      (3, "b", "b", 1L)), got)
  }

  test("counts overlap, merges do not: 'aaaa' gives (a,a)=3 then [aa,aa]") {
    val sp = spark
    import sp.implicits._
    val docs = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val got = graft.operators.TextOps.bpeMerges(docs, k = 2)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSet
    assert(got == Set(
      (1, "a", "a", 3L), // overlapping positions all counted
      (2, "aa", "aa", 1L)), got) // l2r merge left exactly [aa, aa]
  }

  test("ties break to the lexicographically smallest pair") {
    val sp = spark
    import sp.implicits._
    // 'cd' and 'ab' both have one pair with count 1 → (a,b) wins
    val docs = Seq((1L, "cd ab")).toDF("doc_id", "text")
    val got = graft.operators.TextOps.bpeMerges(docs, k = 1)
      .collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    assert(got == Seq(("a", "b")), got)
  }
}

class ComponentsDfSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  test("HashMin DataFrame components equal the GraphX Pregel twin") {
    val e = graft.sources.SyntheticGraph.portable(spark, 600, 250, "g44")
    val (dfLabels, rounds) =
      graft.operators.GraphBuilder.connectedComponentsDF(e)
    val df = dfLabels.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val gx = graft.operators.Dedup.componentsFromPairs(
      e.select(col("src").as("id_a"), col("dst").as("id_b")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // GraphX covers only vertices with edges; every one must agree
    assert(gx.nonEmpty && rounds >= 1)
    gx.foreach { case (id, c) =>
      assert(df(id) == c, s"vertex $id: df=${df(id)} graphx=$c")
    }
  }

  test("two disjoint paths converge to two min-labeled components") {
    val sp = spark
    import sp.implicits._
    val e = Seq((5L, 4L), (4L, 3L), (10L, 11L), (11L, 12L))
      .toDF("src", "dst")
    val (labels, rounds) =
      graft.operators.GraphBuilder.connectedComponentsDF(e)
    val got = labels.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set(
      (3L, 3L), (4L, 3L), (5L, 3L),
      (10L, 10L), (11L, 10L), (12L, 10L)), got)
    assert(rounds <= 4, s"path of length 2 must settle fast: $rounds")
  }
}

class BrandesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  test("all-source path graph recovers exact betweenness i·(n−1−i)") {
    val sp = spark
    import sp.implicits._
    val e = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val got = graft.operators.Brandes
      .sampledBetweenness(e, seeds = Seq(0L, 1L, 2L, 3L, 4L), depth = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(got == Map(1L -> 3.0, 2L -> 4.0, 3L -> 3.0), got)
  }

  test("star center carries exactly one unit per leaf pair") {
    val sp = spark
    import sp.implicits._
    val e = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("src", "dst")
    val got = graft.operators.Brandes
      .sampledBetweenness(e, seeds = Seq(0L, 1L, 2L, 3L), depth = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(got == Map(0L -> 3.0), got) // C(3,2) leaf pairs
  }

  test("equal-weight diamond splits path counts: σ ratios are honored") {
    val sp = spark
    import sp.implicits._
    // the 4-cycle 0-1-3-2-0 is vertex-transitive: every vertex mediates
    // exactly half of its antipodal pair's two equal shortest paths
    val e = Seq((0L, 1L), (0L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    val got = graft.operators.Brandes
      .sampledBetweenness(e, seeds = Seq(0L, 1L, 2L, 3L), depth = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(got == Map(0L -> 0.5, 1L -> 0.5, 2L -> 0.5, 3L -> 0.5), got)
  }
}

class CompactionSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  test("compaction shrinks the file count and preserves every row") {
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("value"))
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_compact_spec").toString
    try {
      ev.repartition(32).write.mode("overwrite").parquet(s"$tmp/small")
      spark.read.parquet(s"$tmp/small").coalesce(2)
        .write.mode("overwrite").parquet(s"$tmp/compact")
      def nFiles(p: String) = new java.io.File(p).listFiles()
        .count(f => f.getName.endsWith(".parquet"))
      assert(nFiles(s"$tmp/small") > 10, "fragmented copy not fragmented")
      assert(nFiles(s"$tmp/compact") <= 2, "compaction did not compact")
      val a = spark.read.parquet(s"$tmp/small")
        .agg(count(lit(1)), sum(col("value"))).head()
      val b = spark.read.parquet(s"$tmp/compact")
        .agg(count(lit(1)), sum(col("value"))).head()
      assert(a.getLong(0) == b.getLong(0))
      assert(math.abs(a.getDouble(1) - b.getDouble(1)) < 1e-6)
    } finally {
      import scala.jdk.CollectionConverters._
      val root = java.nio.file.Paths.get(tmp)
      java.nio.file.Files.walk(root).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }
}

class FilteredIvfSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("filtered disk probe: both prunings in the plan, exact at full probe") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val index = graft.operators.Similarity.buildIvfIndex(emb, nList = 8)
    val tmp = java.nio.file.Files.createTempDirectory("ivf_filt").toString
    try {
      graft.operators.Similarity.writeIvfIndex(index, tmp)
      val disk = graft.operators.Similarity.readIvfIndex(spark, tmp)
      val allowed = emb.filter(col("label").isin(2, 7)).select(col("vec_id"))
      val probed = graft.operators.Similarity.probeIvfPruned(
        disk, Seq(0L, 1L, 2L), k = 5, nProbe = 8, allowed = Some(allowed))
      val p = probed.queryExecution.executedPlan.toString
      // file-level list pruning AND the pushed-down metadata predicate
      // must BOTH be visible — the two prunings compose
      assert("PartitionFilters: \\[[^\\]]*c_id".r.findFirstIn(p).isDefined, p)
      assert(p.contains("In(label"), "label predicate not pushed: " + p)
      // nProbe = nList ⇒ exact filtered kNN
      val got = probed.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val exact = graft.operators.Similarity.knnFiltered(
        emb, Seq(0L, 1L, 2L), k = 5, corpusPred = col("label").isin(2, 7))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == exact)
      // at nProbe < nList the filtered probe stays a SUBSET of exact
      val part = graft.operators.Similarity.probeIvfPruned(
        disk, Seq(0L, 1L, 2L), k = 5, nProbe = 3, allowed = Some(allowed))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      part.foreach { case (pid, vid) =>
        val lbl = emb.filter(col("vec_id") === vid)
          .select(col("label")).head().getInt(0)
        assert(Set(2, 7).contains(lbl), s"unfiltered candidate $vid")
        assert(pid != vid)
      }
    } finally {
      index.release()
      import scala.jdk.CollectionConverters._
      val root = java.nio.file.Paths.get(tmp)
      java.nio.file.Files.walk(root).iterator().asScala.toSeq.reverse
        .foreach(pth => java.nio.file.Files.deleteIfExists(pth))
    }
  }
}

class ContainmentSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  test("verbatim-embedded doc scores containment 1.0 with low Jaccard") {
    val sp = spark
    import sp.implicits._
    val small = "alpha beta gamma delta epsilon"
    val big = small + " zeta eta theta iota kappa lambda mu nu xi omicron"
    val docs = Seq((1L, small), (2L, big)).toDF("doc_id", "text")
    val cands = Seq((1L, 2L)).toDF("id_a", "id_b")
    val got = graft.operators.Dedup
      .containmentPairs(docs, cands, threshold = 0.5)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
          r.getDouble(4)))
    assert(got.length == 1)
    val (_, _, contA, contB, jac) = got.head
    assert(contA == 1.0, s"small doc fully contained: $contA")
    assert(contB < 0.5, s"big doc not contained in small: $contB")
    assert(jac < 0.5, s"Jaccard misses the superset dup: $jac")
  }

  test("below-threshold pairs are dropped") {
    val sp = spark
    import sp.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "one two three four five six")).toDF("doc_id", "text")
    val cands = Seq((1L, 2L)).toDF("id_a", "id_b")
    assert(graft.operators.Dedup
      .containmentPairs(docs, cands, threshold = 0.5).count() == 0L)
  }
}

class Wave5InvariantSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("BPE merge counts are non-increasing across ranks") {
    // merging pair P cannot create a pair more frequent than P was:
    // any new pair contains the merged symbol, whose occurrence count
    // is bounded by P's pre-merge count — so the learned merge table
    // is always count-sorted
    val got = SparkEntry.queries("d35_bpe_merges")(spark, dir)
      .orderBy(col("m_rank"))
      .collect().map(r => (r.getInt(0), r.getLong(3)))
    assert(got.length == 3)
    got.sliding(2).foreach { case Array((_, a), (_, b)) =>
      assert(a >= b, s"merge counts must not increase: $a -> $b")
    }
  }

  test("temperature thresholds are monotone: bigger sources keep less") {
    val out = graft.operators.Sampling.temperatureSample(
      spark.read.parquet(s"$dir/documents.parquet"), targetFrac = 0.5)
      .select(col("n_source"), col("keep_threshold")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    for ((na, ta) <- out; (nb, tb) <- out if na < nb)
      assert(ta >= tb,
        s"flattening violated: n=$na thr=$ta vs n=$nb thr=$tb")
  }

  test("every node2vec transition follows an existing edge") {
    val e = graft.sources.SyntheticGraph.portable(spark, 200, 600, "n2vinv")
    val edges = e.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val walks = graft.operators.Walks
      .node2vecWalks(e, len = 4, salt = "n2vinv")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1)
    walks.values.foreach { steps =>
      steps.sortBy(_._2).map(_._3).sliding(2).foreach {
        case Array(a, b) =>
          assert(edges.contains((a, b)), s"phantom step $a -> $b")
        case _ => ()
      }
    }
  }

  test("MMR rank 1 is the pure-relevance argmax for every probe") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val mmr = graft.operators.Similarity
      .mmrRerank(emb, Seq(0L, 1L, 2L), shortlist = 10, k = 3)
      .filter(col("mmr_rank") === 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val top1 = graft.operators.Similarity.knnBatch(emb, Seq(0L, 1L, 2L), k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(mmr == top1)
  }

  test("point-in-time state is never at or after the probe timestamp") {
    val ev = graft.sources.Tables.events(spark, dir)
    val out = graft.operators.TemporalJoins
      .pointInTimeState(ev, probeType = "purchase")
    val evTs = ev.select(col("event_id"), unix_micros(col("ts")).as("ets"))
    val bad = out.filter(col("state_event_id") >= 0)
      .join(evTs, out("state_event_id") === evTs("event_id"))
      .filter(col("ets") >= col("pts"))
    assert(bad.count() == 0, "future or same-instant state leaked")
  }
}

class JsonPropsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  test("malformed JSON surfaces as NULL, counted but not parsed") {
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.types._
    val df = Seq("""{"k": 3}""", """{"k": 7}""", """{nope""", null)
      .toDF("props")
    val parsed = df.withColumn(
      "k",
      from_json(col("props"), StructType(Seq(StructField("k", IntegerType))))
        .getField("k"))
    val agg = parsed.agg(
      count(lit(1)).as("n"), count(col("k")).as("n_parsed"),
      sum(col("k")).as("s")).head()
    assert(agg.getLong(0) == 4L)
    assert(agg.getLong(1) == 2L)
    assert(agg.getLong(2) == 10L)
  }
}
