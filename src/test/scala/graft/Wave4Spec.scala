package graft

import graft.operators.{GraphBuilder, Sampling, Similarity, Walks}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 wave: link prediction (g34), modularity (g35), random walks
  * (g36), clustering coefficients (g37), exact pruned radius search
  * (e17), token-budget sampling (d30), event funnel (q29).
  */
class LinkPredictionSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  test("4-cycle: both diagonals score cn=2, jac=1, aa=2/ln2") {
    val sp = spark
    import sp.implicits._
    val e = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L)).toDF("src", "dst")
    val got = GraphBuilder.linkPrediction(e, topN = 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    val aa = BigDecimal(2.0 / math.log(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.toSet == Set((0L, 2L, 2L, 1.0, aa), (1L, 3L, 2L, 1.0, aa)))
  }

  test("adjacent pairs are excluded; hub middle contributes 1/ln(deg)") {
    val sp = spark
    import sp.implicits._
    // star 0-{1,2,3} plus edge 1-2: (1,2) adjacent → excluded even
    // though they share middle 0; (1,3) and (2,3) are candidates
    val e = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L)).toDF("src", "dst")
    val got = GraphBuilder.linkPrediction(e, topN = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 3L), (2L, 3L)))
  }

  test("maxDeg: a hub above the cap contributes no wedges") {
    val sp = spark
    import sp.implicits._
    // hub 0 has degree 5 (wedge middles 1..5 would mint C(5,2) = 10
    // pairs through it); the side path 1-6-2 has middle 6 of degree 2.
    // Capped at 4, hub 0 is excluded as a MIDDLE: the surviving wedges
    // are (1,2) via middle 6 and (0,6) via middles 1 and 2 — no pair
    // witnessed only by the hub appears. Endpoint degrees in the
    // Jaccard denominator stay the EXACT uncapped values (the hub's
    // degree 5 still appears in (0,6)'s denominator).
    val e = Seq(
      (0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L), (0L, 5L),
      (1L, 6L), (2L, 6L)).toDF("src", "dst")
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r9(x: Double) =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val capped = GraphBuilder.linkPrediction(e, topN = 100, maxDeg = Some(4))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(capped.toSet == Set(
      // (1,2): cn=1 (middle 6, deg 2); jac = 1/(2+2−1) — exact degrees
      (1L, 2L, 1L, r9(1.0 / 3.0), r6(1.0 / math.log(2.0))),
      // (0,6): cn=2 (middles 1,2 of deg 2); jac = 2/(5+2−2)
      (0L, 6L, 2L, r9(2.0 / 5.0), r6(2.0 / math.log(2.0)))))
    // uncapped control: the hub mints all C(5,2) = 10 pairs among
    // {1..5}, plus (0,6) — and (1,2) now counts hub 0 as a second
    // common neighbor
    val exact = GraphBuilder.linkPrediction(e, topN = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.size == 11)
    assert(GraphBuilder.linkPrediction(e, topN = 100)
      .filter(col("u") === 1L && col("v") === 2L)
      .collect().head.getLong(2) == 2L)
  }
}

class ModularitySpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  test("two triangles bridged by one edge, natural split: Q = 5/14") {
    val sp = spark
    import sp.implicits._
    val e = Seq(
      (0L, 1L), (1L, 2L), (2L, 0L),
      (3L, 4L), (4L, 5L), (5L, 3L),
      (2L, 3L)).toDF("src", "dst")
    val lbl = Seq(
      (0L, 0L), (1L, 0L), (2L, 0L),
      (3L, 1L), (4L, 1L), (5L, 1L)).toDF("id", "lbl")
    val r = GraphBuilder.modularity(e, lbl).collect().head
    assert(r.getAs[Long]("n_comms") == 2L)
    assert(r.getAs[Long]("m_edges") == 7L)
    assert(r.getAs[Long]("intra_edges") == 6L)
    assert(r.getAs[Long]("sum_deg_sq") == 98L)
    // 6/7 − 98/(4·49) = 0.357142857
    assert(r.getAs[Double]("q_r") == 0.357142857)
  }

  test("everything in one community scores Q = 0") {
    val sp = spark
    import sp.implicits._
    val e = Seq((0L, 1L), (1L, 2L), (2L, 0L)).toDF("src", "dst")
    val lbl = Seq((0L, 7L), (1L, 7L), (2L, 7L)).toDF("id", "lbl")
    val r = GraphBuilder.modularity(e, lbl).collect().head
    // intra/m = 1, ΣD² = 36, 4m² = 36 ⇒ Q = 1 − 1 = 0
    assert(r.getAs[Double]("q_r") == 0.0)
  }
}

class WalksSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  test("walks start at each vertex, follow edges, stop at sinks") {
    val sp = spark
    import sp.implicits._
    // 0→1→2, 2 is a sink; 3→3 self-loop walks forever
    val e = Seq((0L, 1L), (1L, 2L), (3L, 3L)).toDF("src", "dst")
    val got = Walks.randomWalks(e, len = 4, salt = "t")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val byWalk = got.groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3).toList).toMap
    assert(byWalk(0L) == List(0L, 1L, 2L)) // deterministic chain, stops
    assert(byWalk(1L) == List(1L, 2L))
    assert(byWalk(2L) == List(2L)) // sink: step 0 only
    assert(byWalk(3L) == List(3L, 3L, 3L, 3L, 3L)) // self-loop, full len
  }

  test("every step follows an existing edge; reruns are identical") {
    val sp = spark
    import sp.implicits._
    val e = graft.sources.SyntheticGraph.portable(sp, 50, 200, "wtest")
    val edgeSet = e.select(col("src"), col("dst")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def run() = Walks.randomWalks(e, len = 5, salt = "w1")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val a = run()
    assert(a.toSet == run().toSet) // deterministic
    val byWalk = a.groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3).toList).toMap
    byWalk.values.foreach { path =>
      path.sliding(2).foreach {
        case List(u, v) => assert(edgeSet.contains((u, v)))
        case _          => ()
      }
    }
    // a different salt redraws at least one walk on this fixture
    val b = Walks.randomWalks(e, len = 5, salt = "w2")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(a.toSet != b.toSet)
  }
}

class WeightedWalksSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  test("integer inverse-CDF: the draw lands in the right weight interval") {
    val sp = spark
    import sp.implicits._
    // vertex 0 has neighbors 1 (w=3) and 2 (w=1): cums = [3, 4],
    // tot = 4 — hmod in {0,1,2} → 1, hmod = 3 → 2. Verify against the
    // same draw recomputed in the test.
    val e = Seq((0L, 1L, 3L), (0L, 2L, 1L)).toDF("src", "dst", "w")
    val got = graft.operators.Walks.weightedRandomWalks(e, len = 1, salt = "tw")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val step1 = got.filter(t => t._1 == 0L && t._2 == 1).map(_._3).toList
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest("0:1:tw".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val hmod = java.lang.Long.parseLong(md.take(8), 16) % 4
    assert(step1 == List(if (hmod < 3) 1L else 2L))
  }

  test("duplicate directed edges merge by weight sum; walks follow edges") {
    val sp = spark
    import sp.implicits._
    val base = graft.sources.SyntheticGraph.portable(sp, 40, 160, "wwtest")
      .distinct()
      .withColumn("w", pmod(col("src") + col("dst"), lit(3)) + 1)
    val dup = base.union(base) // duplicates must not change the CDF
    def run(e: org.apache.spark.sql.DataFrame) =
      graft.operators.Walks.weightedRandomWalks(e, len = 4, salt = "ww")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val a = run(base)
    // duplicates double every weight — the CDF intervals scale
    // uniformly only if ALL weights double, which they do here, so the
    // picks are NOT guaranteed identical; what is guaranteed: every
    // step follows an edge and the walk set is deterministic per input
    assert(a == run(base))
    val edgeSet = base.select(col("src"), col("dst"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    a.groupBy(_._1).foreach { case (_, rows) =>
      val path = rows.toList.sortBy(_._2).map(_._3)
      path.sliding(2).foreach {
        case List(u, v) => assert(edgeSet.contains((u, v)))
        case _          => ()
      }
    }
    assert(run(dup) == run(dup)) // deterministic under duplication too
  }
}

class KnnClassifySpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  test("majority label of the exact top-k, smallest label on ties") {
    val sp = spark
    import sp.implicits._
    // probe 0 at the origin-ish; 3 neighbors of label 1 slightly closer
    // than 3 of label 2; k=4 → votes 3:1 for label 1
    def v(x: Double, y: Double) = Seq(x.toFloat, y.toFloat)
    val emb = Seq(
      (0L, v(1.0, 0.0), 9),
      (1L, v(0.99, 0.1), 1), (2L, v(0.98, 0.15), 1), (3L, v(0.97, 0.2), 1),
      (4L, v(0.5, 0.8), 2), (5L, v(0.45, 0.85), 2), (6L, v(0.4, 0.9), 2))
      .toDF("vec_id", "embedding", "label")
    val got = graft.operators.Similarity
      .knnClassify(emb, probeIds = Seq(0L), k = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(got.toList == List((0L, 1, 3L)))
    // k=6: 3 votes each → tie broken by the SMALLEST label
    val tie = graft.operators.Similarity
      .knnClassify(emb, probeIds = Seq(0L), k = 6)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(tie.toList == List((0L, 1, 3L)))
  }
}

class CoarsenSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  test("two bridged triangles contract to a 2-vertex supergraph with self-loops") {
    val sp = spark
    import sp.implicits._
    val e = Seq(
      (0L, 1L), (1L, 2L), (2L, 0L),
      (3L, 4L), (4L, 5L), (5L, 3L),
      (2L, 3L)).toDF("src", "dst")
    val lbl = Seq(
      (0L, 0L), (1L, 0L), (2L, 0L),
      (3L, 1L), (4L, 1L), (5L, 1L)).toDF("id", "lbl")
    val got = graft.operators.GraphBuilder.coarsen(e, lbl)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((0L, 0L, 3L), (1L, 1L, 3L), (0L, 1L, 1L)))
  }

  test("multi-edges and direction collapse before contraction") {
    val sp = spark
    import sp.implicits._
    val e = Seq((0L, 1L), (1L, 0L), (0L, 1L), (1L, 1L)).toDF("src", "dst")
    val lbl = Seq((0L, 5L), (1L, 9L)).toDF("id", "lbl")
    val got = graft.operators.GraphBuilder.coarsen(e, lbl)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((5L, 9L, 1L))) // one undirected edge, no self-loop row
  }
}

class SessionPathsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  test("bigrams never cross a session boundary; top-20 cut is total-ordered") {
    val rows = SparkEntry.queries("q31_session_paths")(
      spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(rows.nonEmpty && rows.length <= 20)
    // counts are sorted descending with (t1, t2) tie-break
    val ns = rows.map(_._3)
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
    // total bigram count is bounded by (#events − #sessions)
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    val nEvents = ev.count()
    val nSessions = graft.streaming.EventStreams
      .sessionizeBatch(ev).count()
    assert(ns.sum <= nEvents - nSessions)
  }
}

class NeighborAggSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  test("path 0→1→2: hand-computed 1- and 2-hop sums and mean") {
    val sp = spark
    import sp.implicits._
    // directed path: outdeg = (1,1,0), indeg = (0,1,1); undirected
    // neighbors: 0↔1, 1↔2
    val e = Seq((0L, 1L), (1L, 2L)).toDF("src", "dst")
    val got = graft.operators.GraphBuilder.neighborAgg(e)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getDouble(8))).toMap
    // v0: nbr {1}: s1_out=1, s1_in=1; 2-hop over {1}: s2 = h1(1)
    // h1(1): nbrs {0,2}: s1_out=1, s1_in=1; h1(2): nbrs {1}: (1,1)
    assert(got(0L) == ((1L, 0L, 1L, 1L, 1L, 1L, 1L, 1.0)))
    assert(got(1L) == ((1L, 1L, 2L, 1L, 1L, 2L, 2L, 0.5)))
    assert(got(2L) == ((0L, 1L, 1L, 1L, 1L, 1L, 1L, 1.0)))
  }

  test("isolated self-loop vertex reports zeros") {
    val sp = spark
    import sp.implicits._
    val e = Seq((0L, 1L), (5L, 5L)).toDF("src", "dst")
    val got = graft.operators.GraphBuilder.neighborAgg(e)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got(5L) == 0L) // self-loop only: no undirected neighbors
  }
}

class ContaminationReportSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  test("fraction counts exactly the grams shared with the corpus") {
    val sp = spark
    import sp.implicits._
    val corpus = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    // item 10 shares its one 4-gram "b c d e" with the corpus; item 11
    // shares none
    val bench = Seq(
      (10L, "b c d e"), (11L, "x y z w v")).toDF("doc_id", "text")
    val got = graft.operators.Dedup.contaminationReport(corpus, bench)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    assert(got(10L) == ((1L, 1L, 1.0)))
    assert(got(11L) == ((2L, 0L, 0.0))) // 5 tokens → 2 distinct 4-grams
  }
}

class StreamFunnelSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  private def runFunnel(
      events: Seq[graft.streaming.EventStreams.Event]): Map[Long, Long] = {
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val ms = MemoryStream[graft.streaming.EventStreams.Event]
    val qname =
      "sfspec_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = graft.streaming.EventStreams.funnelEventTime(ms.toDS())
      .writeStream.format("memory").queryName(qname)
      .outputMode("append").start()
    try {
      ms.addData(events.toIndexedSeq)
      q.processAllAvailable()
      val maxMs = events.map(_.ts.getTime).max
      ms.addData(graft.streaming.EventStreams.Event(
        -1L, new java.sql.Timestamp(maxMs + 4L * 3600 * 1000), -1L,
        "sentinel", 0.0))
      q.processAllAvailable()
      ms.addData(graft.streaming.EventStreams.Event(
        -1L, new java.sql.Timestamp(maxMs + 8L * 3600 * 1000), -1L,
        "sentinel", 0.0))
      q.processAllAvailable()
    } finally q.stop()
    spark.table(qname).filter(org.apache.spark.sql.functions.col("user_id") >= 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("a LATE earlier view shifts the window and re-decides the click stage") {
    import graft.streaming.EventStreams.Event
    def ev(id: Long, t: Long, u: Long, typ: String) =
      Event(id, new java.sql.Timestamp(t), u, typ, 0.0)
    val H = 3600 * 1000L
    val B = 1_600_000_000_000L // realistic base: epoch-0 rows would sit
                               // ON the initial watermark and be dropped
    // delivery order: view@3h first, click@1h second, then a LATE
    // view@0h. Final truth: t1 = 0h, click@1h ∈ (0h, 2h] → stage 2.
    // An incremental fold that resolved t2 against t1 = 3h would have
    // discarded the click (1h ≤ 3h fails the strictly-later rule).
    val out = runFunnel(Seq(
      ev(1, B + 3 * H, 7L, "view"),
      ev(2, B + 1 * H, 7L, "click"),
      ev(3, B, 7L, "view")))
    assert(out == Map(7L -> 2L))
  }

  test("conversion windows bound each stage; stages 0/1/3 all reachable") {
    import graft.streaming.EventStreams.Event
    def ev(id: Long, t: Long, u: Long, typ: String) =
      Event(id, new java.sql.Timestamp(t), u, typ, 0.0)
    val H = 3600 * 1000L
    val B = 1_600_000_000_000L
    val out = runFunnel(Seq(
      // user 1: full funnel inside the windows → 3
      ev(10, B, 1L, "view"), ev(11, B + H, 1L, "click"),
      ev(12, B + 2 * H, 1L, "purchase"),
      // user 2: click 3h after view — outside the 2h window → 1
      ev(20, B, 2L, "view"), ev(21, B + 3 * H, 2L, "click"),
      // user 3: clicks but never views → 0
      ev(30, B, 3L, "click")))
    assert(out == Map(1L -> 3L, 2L -> 1L, 3L -> 0L))
  }
}

class GraphFeaturesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  test("p3 feature table: one row per vertex, internally consistent") {
    val df = SparkEntry.queries("p3_graph_features")(
      spark, "/root/testdata/sf0.001")
    val rows = df.collect().map(r => (r.getLong(0), r.getDouble(1),
      r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.map(_._1).distinct.length == rows.length) // one per vertex
    // PR mass ≈ 1 over the table (feature joins lost nobody)
    assert(math.abs(rows.map(_._2).sum - 1.0) < 1e-6)
    // a triangle participant has undirected degree ≥ 2
    rows.filter(_._5 > 0).foreach { r =>
      assert(r._3 + r._4 >= 2, r.toString)
    }
    // core membership is 0/1 and someone is in the 3-core on this fixture
    assert(rows.forall(r => r._6 == 0L || r._6 == 1L))
    assert(rows.exists(_._6 == 1L))
  }
}

class RetentionSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  test("cohort cells partition all user-weeks; offset 0 counts every cohort user") {
    val rows = SparkEntry.queries("q30_retention")(
      spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    assert(rows.forall(_._2 >= 0L)) // no negative offsets
    // every cohort has an offset-0 cell, and it is the cohort's max
    // (users can only retain or churn)
    rows.groupBy(_._1).foreach { case (_, cells) =>
      val byOff = cells.map(c => c._2 -> c._3).toMap
      assert(byOff.contains(0L))
      assert(byOff.values.forall(_ <= byOff(0L)))
    }
  }
}

class ClusteringCoeffSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  test("triangle with a pendant: lcc 1/3 at the junction, 1 in it, 0 leaf") {
    val sp = spark
    import sp.implicits._
    val e = Seq((0L, 1L), (1L, 2L), (2L, 0L), (0L, 3L)).toDF("src", "dst")
    val got = GraphBuilder.clusteringCoefficients(e)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got(0L) == ((1L, 3L, 0.333333333)))
    assert(got(1L) == ((1L, 2L, 1.0)))
    assert(got(2L) == ((1L, 2L, 1.0)))
    assert(got(3L) == ((0L, 1L, 0.0)))
  }
}

class RangeSearchSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("pruned radius search is EXACT vs brute force, and the prune bites") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val idx = Similarity.buildIvfIndex(emb, nList = 8)
    try {
      val tau = 0.2
      val got = Similarity.probeIvfRange(idx, probeId = 0L, minCos = tau)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      // brute force over the same rounded predicate
      val e = emb.select(col("vec_id"),
        col("embedding").cast("array<double>").as("e"))
      val probe = e.filter(col("vec_id") === 0L)
        .select(col("e").as("p")).crossJoin(e.filter(col("vec_id") =!= 0L))
      val want = probe
        .select(col("vec_id"),
          round(Similarity.cosine(col("e"), col("p")), 6).as("c"))
        .filter(col("c") >= tau)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(got == want)
      assert(want.nonEmpty) // a vacuous equality would prove nothing
      // this corpus is diffuse (list radii ≈ 1.4 rad), so the bound
      // cannot prune here — exactness is the claim on this data; the
      // prune's bite is proven on the clustered fixture below
      assert(Similarity.rangeListsScanned(idx, 0L, tau) == idx.nList)
    } finally idx.release()
  }

  test("on clustered data the triangle bound skips far lists, still exact") {
    val sp = spark
    import sp.implicits._
    // 4 orthogonal blobs in 8-dim: unit axis centers + a small
    // deterministic per-id perturbation — the tight-radius regime a
    // real embedding index lives in (near-dup corpora cluster hard)
    val dim = 8
    val rows = (0 until 200).map { i =>
      val blob = i % 4
      val v = Array.tabulate(dim) { d =>
        val h = ((i * 31 + d * 7) % 13 - 6) / 60.0f // in [-0.1, 0.1]
        (if (d == blob) 1.0f else 0.0f) + h
      }
      (i.toLong, v.toSeq)
    }
    val emb = rows.toDF("vec_id", "embedding")
    val idx = Similarity.buildIvfIndex(emb, nList = 4)
    try {
      val tau = 0.8
      val got = Similarity.probeIvfRange(idx, probeId = 0L, minCos = tau)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      val e = emb.select(col("vec_id"),
        col("embedding").cast("array<double>").as("e"))
      val want = e.filter(col("vec_id") === 0L).select(col("e").as("p"))
        .crossJoin(e.filter(col("vec_id") =!= 0L))
        .select(col("vec_id"),
          round(Similarity.cosine(col("e"), col("p")), 6).as("c"))
        .filter(col("c") >= tau)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(got == want)
      assert(want.nonEmpty)
      assert(Similarity.rangeListsScanned(idx, 0L, tau) < idx.nList)
    } finally idx.release()
  }
}

class TokenBudgetSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  test("budget cuts in hash order; crossing doc kept; audit columns exact") {
    val sp = spark
    import sp.implicits._
    val docs = Seq(
      (1L, "s", "a b c"),        // 3 tokens
      (2L, "s", "d e f g"),      // 4
      (3L, "s", "h i"),          // 2
      (4L, "s", "j k l m n")     // 5
    ).toDF("doc_id", "source", "text")
    val out = Sampling.tokenBudgetSample(docs, budget = 6, shardCol = "source")
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getInt(4)))
    // reconstruct the expected hash order with the same draw
    val order = Seq(1L, 2L, 3L, 4L).map { id =>
      id -> java.security.MessageDigest.getInstance("MD5")
        .digest(s"tokbudget-v1:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    }.sortBy(_._2).map(_._1)
    val nTok = Map(1L -> 3L, 2L -> 4L, 3L -> 2L, 4L -> 5L)
    var cum = 0L
    val expect = order.map { id =>
      val kept = if (cum < 6) 1 else 0
      cum += nTok(id)
      (id, nTok(id), cum, kept)
    }.toSet
    assert(out.toSet == expect)
    // invariant: the kept set is a prefix of the hash order and its
    // token total crosses the budget exactly once
    val keptTok = out.filter(_._4 == 1).map(_._2).sum
    assert(keptTok >= 6 || out.forall(_._4 == 1))
  }
}

class FunnelSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  test("funnel counts are monotone non-increasing down the stages") {
    val got = SparkEntry.queries("q29_funnel")(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet ==
      Set("0_all", "1_view", "2_click", "3_purchase"))
    assert(got("0_all") >= got("1_view"))
    assert(got("1_view") >= got("2_click"))
    assert(got("2_click") >= got("3_purchase"))
    assert(got("1_view") > 0L)
  }

  test("strict ordering: a click before the first view does not count") {
    val sp = spark
    import sp.implicits._
    // build a micro events frame through the same SQL shape by hand:
    // user 1 clicks BEFORE viewing → reaches stage 1 only
    val ev = Seq(
      (1L, "click", "2024-01-01 00:00:00"),
      (1L, "view", "2024-01-01 01:00:00"),
      (2L, "view", "2024-01-01 00:00:00"),
      (2L, "click", "2024-01-01 01:00:00"),
      (2L, "purchase", "2024-01-01 02:00:00"))
      .toDF("user_id", "event_type", "ts_s")
      .select(col("user_id"), col("event_type"),
        col("ts_s").cast("timestamp").as("ts"))
    val v1 = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val v2 = ev.filter(col("event_type") === "click")
      .join(v1, Seq("user_id")).filter(col("ts") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val v3 = ev.filter(col("event_type") === "purchase")
      .join(v2, Seq("user_id")).filter(col("ts") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    assert(v1.count() == 2 && v2.count() == 1 && v3.count() == 1)
    assert(v2.collect().head.getLong(0) == 2L)
  }
}
