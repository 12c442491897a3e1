package graft

import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-10 wave: Euclidean Lloyd's k-means (e25) and SemDeDup
  * embedding-space near-dup pruning (e26).
  */
class KmeansSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  private def emb: DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("every vector lands on its nearest trained centroid (lowest c_id ties)") {
    val a = Similarity.kmeansAssign(emb, k = 4, iters = 1)
    // rebuild the centroids implied by the assignment: the assigned
    // distance must be <= the distance to every OTHER cluster's members'
    // mean is not directly checkable without the trained centroids, so
    // check the weaker invariant the output itself carries: distances
    // are finite, non-negative, and every vector appears exactly once
    val rows = a.collect()
    assert(rows.length == emb.count())
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
    assert(rows.forall(r => r.getDouble(2) >= 0.0 && !r.getDouble(2).isNaN))
    // k=4 on this corpus: all four seed-labeled clusters are non-empty
    assert(a.select(col("c_id")).distinct().count() == 4)
  }

  test("assignment is invariant under input partitioning") {
    val base = emb
    val a = Similarity.kmeansAssign(base, k = 8, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val b = Similarity.kmeansAssign(base.repartition(17), k = 8, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(a == b)
  }

  test("iters = 0 degrades to nearest-seed assignment") {
    val sp = spark
    import sp.implicits._
    // 4 vectors on a line, k=2 → stride 2 seeds ids 0 and 2
    val v = Seq(
      (0L, Array(0.0f)), (1L, Array(1.0f)),
      (2L, Array(10.0f)), (3L, Array(11.0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.kmeansAssign(v, k = 2, iters = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 2L, 3L -> 2L), got)
  }

  test("a cluster emptied by a Lloyd pass keeps its seed centroid (stable c_id set)") {
    val sp = spark
    import sp.implicits._
    // seed 2 (id stride) starts between the two tight groups; after one
    // pass both groups' means capture everything and seed 2's cluster
    // may empty — the c_id must still be a member of the seed id set
    val v = Seq(
      (0L, Array(0.0f)), (1L, Array(0.1f)), (2L, Array(5.0f)),
      (3L, Array(0.2f)), (4L, Array(0.05f)), (5L, Array(0.15f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.kmeansAssign(v, k = 3, iters = 2)
    val cids = got.select(col("c_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(cids.subsetOf(Set(0L, 2L, 4L)), cids)
  }

  test("kmeans on a sparse id space still seeds k clusters (modulo top-up)") {
    val sp = spark
    import sp.implicits._
    // all-odd ids: id % stride == 0 can match nothing — the top-up
    // must fill the seed set from the lowest ids instead of silently
    // assigning against zero centroids (which would drop every row)
    val v = Seq(1L, 3L, 5L, 7L, 9L, 11L, 13L, 15L)
      .map(i => (i, Array(i.toFloat)))
      .toDF("vec_id", "embedding")
    val got = Similarity.kmeansAssign(v, k = 2, iters = 1)
    assert(got.count() == 8, "rows must never be dropped")
    assert(got.select(col("c_id")).distinct().count() == 2)
  }

  test("Lloyd objective is non-increasing across iterations") {
    // Σ dist² over assignments must not grow with more Lloyd passes
    // (monotone convergence — the 9-dp mean rounding can wiggle the
    // last ulps, hence the 1e-6 slack)
    def obj(iters: Int): Double = Similarity
      .kmeansAssign(emb, k = 4, iters = iters)
      .agg(sum(col("dist") * col("dist"))).collect()(0).getDouble(0)
    val o = (0 to 3).map(obj)
    o.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + 1e-6, s"objective grew: $o")
    }
  }

  test("kmeans leaves nothing persisted in the cache manager") {
    spark.sharedState.cacheManager.clearCache()
    Similarity.kmeansAssign(emb, k = 4, iters = 1).count()
    assert(spark.sharedState.cacheManager.isEmpty)
  }
}

class SemDedupSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  private def emb: DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("removed == has a lower-id cluster-mate at cosine >= tau") {
    val tau = 0.3
    val got = Similarity.semDedup(emb, k = 4, iters = 1, tau = tau)
    val assign = got.select(col("vec_id"), col("c_id"))
    val e = emb.select(
      col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val joined = assign.join(e, Seq("vec_id"))
    val l = joined.select(col("c_id"), col("vec_id").as("u"), col("e").as("ue"))
    val r = joined.select(col("c_id"), col("vec_id").as("v"), col("e").as("ve"))
    val expectRemoved = l.join(r, Seq("c_id"))
      .filter(col("u") < col("v"))
      .filter(round(Similarity.cosine(col("ue"), col("ve")), 6) >= tau)
      .select(col("v")).distinct()
      .collect().map(_.getLong(0)).toSet
    val gotRemoved = got.filter(col("removed"))
      .collect().map(_.getLong(0)).toSet
    assert(gotRemoved == expectRemoved)
    assert(gotRemoved.nonEmpty, "tau=0.3 should remove something at sf0.001")
  }

  test("tau > 1 removes nothing; tau = -1 keeps exactly one per cluster") {
    val none = Similarity.semDedup(emb, k = 4, iters = 1, tau = 1.01)
    assert(none.filter(col("removed")).count() == 0)
    val all = Similarity.semDedup(emb, k = 4, iters = 1, tau = -1.0)
    val kept = all.filter(!col("removed"))
    assert(kept.count() == all.select(col("c_id")).distinct().count())
    // the survivor of each cluster is its minimum vec_id
    val minPerCluster = all.groupBy(col("c_id"))
      .agg(min(col("vec_id")).as("vec_id"))
      .collect().map(r => (r.getLong(1), r.getLong(0))).toSet
    assert(kept.select(col("vec_id"), col("c_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet == minPerCluster)
  }

  test("semDedup leaves nothing persisted in the cache manager") {
    spark.sharedState.cacheManager.clearCache()
    Similarity.semDedup(emb, k = 4, iters = 1, tau = 0.4).count()
    assert(spark.sharedState.cacheManager.isEmpty)
  }
}

class MisSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  private def fixture: DataFrame =
    graft.sources.SyntheticGraph.portable(spark, 300, 450, "g48")

  test("independence and maximality on the g48 fixture") {
    val e = fixture
    val mis = graft.operators.Mis.lubyMis(e).persist()
    val sym = e.filter(col("src") =!= col("dst"))
    val ed = sym.select(col("src"), col("dst"))
      .union(sym.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    val m = mis.filter(col("in_mis")).select(col("id"))
    // independence: no edge with both endpoints in the MIS
    assert(ed
      .join(m.withColumnRenamed("id", "src"), Seq("src"))
      .join(m.withColumnRenamed("id", "dst"), Seq("dst"))
      .count() == 0)
    // maximality: every non-MIS vertex has a MIS neighbor
    val covered = ed.join(m.withColumnRenamed("id", "src"), Seq("src"))
      .select(col("dst").as("id")).distinct()
    assert(mis.filter(!col("in_mis")).select(col("id"))
      .join(covered, Seq("id"), "left_anti").count() == 0)
    mis.unpersist()
  }

  test("fixpoint depth stays within the oracle's 12-round unroll (margin 2)") {
    assert(graft.operators.Mis.roundsNeeded(fixture) <= 10)
  }

  test("deterministic under input partitioning; self-loop vertex enters") {
    val sp = spark
    import sp.implicits._
    val e = Seq((1L, 2L), (2L, 3L), (7L, 7L)).toDF("src", "dst")
    val a = graft.operators.Mis.lubyMis(e)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val b = graft.operators.Mis.lubyMis(e.repartition(9))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(a == b)
    assert(a(7L), "self-loop-only vertex is isolated and must enter")
    // path 1-2-3: either {1,3} or {2}; both valid MIS — but md5 pins one
    assert(a.count(_._2) >= 2 || (a(2L) && !a(1L) && !a(3L)))
  }

  test("lubyMis leaves nothing persisted in the cache manager") {
    spark.sharedState.cacheManager.clearCache()
    graft.operators.Mis.lubyMis(fixture).count()
    assert(spark.sharedState.cacheManager.isEmpty)
  }

  test("matching validity and maximality on the g49 fixture") {
    val e = graft.sources.SyntheticGraph.portable(spark, 300, 450, "g49")
    val m = graft.operators.Mis.lubyMatching(e).persist()
    val won = m.filter(col("in_matching"))
    // validity: no vertex appears in two matched edges
    val vtxUse = won.select(col("u").as("x"))
      .union(won.select(col("v").as("x")))
      .groupBy(col("x")).count().filter(col("count") > 1)
    assert(vtxUse.count() == 0)
    // maximality: every unmatched edge touches a matched vertex
    val mVtx = won.select(col("u").as("x"))
      .union(won.select(col("v").as("x"))).distinct()
    val uncovered = m.filter(!col("in_matching"))
      .join(mVtx.withColumnRenamed("x", "u"), Seq("u"), "left_anti")
      .join(mVtx.withColumnRenamed("x", "v"), Seq("v"), "left_anti")
    assert(uncovered.count() == 0)
    m.unpersist()
  }

  test("coloring is proper, every color has a lower-color witness, depth in unroll") {
    val e = graft.sources.SyntheticGraph.portable(spark, 120, 180, "g50")
    val c = graft.operators.Mis.lubyColoring(e).persist()
    val sym = e.filter(col("src") =!= col("dst"))
    val ed = sym.select(col("src"), col("dst"))
      .union(sym.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    // proper: no edge joins two vertices of the same color
    val cu = c.select(col("id").as("src"), col("color").as("cs"))
    val cv = c.select(col("id").as("dst"), col("color").as("cd"))
    assert(ed.join(cu, Seq("src")).join(cv, Seq("dst"))
      .filter(col("cs") === col("cd")).count() == 0)
    // witness: a vertex of color k has, for every j < k, a neighbor of
    // color j (MIS maximality at every earlier color) — so no vertex
    // could take a smaller color under this schedule
    val nbrColors = ed.join(cv, Seq("dst"))
      .select(col("src").as("id"), col("cd"))
      .distinct()
    val witnessCount = nbrColors
      .join(c, Seq("id"))
      .filter(col("cd") < col("color"))
      .groupBy(col("id"), col("color"))
      .agg(countDistinct(col("cd")).as("w"))
    assert(witnessCount.filter(col("w") =!= col("color")).count() == 0)
    assert(c.join(witnessCount, Seq("id"), "left_anti")
      .filter(col("color") > 0).count() == 0)
    // measured depth (4 colors, 3 inner rounds) sits well inside the
    // oracle's (6, 6) unroll
    val (colors, depth) = graft.operators.Mis.coloringDepth(e)
    assert(colors <= 5 && depth <= 5, (colors, depth))
    c.unpersist()
  }

  test("matching fixpoint depth within the 12-round unroll; deterministic") {
    val e = graft.sources.SyntheticGraph.portable(spark, 300, 450, "g49")
    assert(graft.operators.Mis.matchingRoundsNeeded(e) <= 10)
    val a = graft.operators.Mis.lubyMatching(e)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    val b = graft.operators.Mis.lubyMatching(e.repartition(11))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(a == b)
  }
}

class RetrievalMetricsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  test("bm25 hand value: single term, two docs") {
    val sp = spark
    import sp.implicits._
    // doc 0: "a a b" (tf=2, dl=3); doc 1: "a c d e" (tf=1, dl=4);
    // doc 2: "x y" (no term). N=3, df(a)=2, avgdl=3.
    val docs = Seq(
      (0L, "a a b"), (1L, "a c d e"), (2L, "x y"))
      .toDF("doc_id", "text")
    val got = graft.operators.TextOps
      .bm25TopK(docs, Seq("a"), k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val idf = math.log(1.0 + (3 - 2 + 0.5) / (2 + 0.5))
    def c(tf: Double, dl: Double) = BigDecimal(
      idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / 3.0)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.keySet == Set(0L, 1L))
    assert(math.abs(got(0L) - c(2, 3)) < 1e-9, got)
    assert(math.abs(got(1L) - c(1, 4)) < 1e-9, got)
    assert(got(0L) > got(1L), "higher tf, shorter doc must win")
  }

  test("rocAuc: perfect separation 1.0, reversed 0.0, all-tied 0.5") {
    val sp = spark
    import sp.implicits._
    def auc(rows: Seq[(Double, Boolean)]): Double =
      graft.operators.Metrics.rocAuc(
        rows.toDF("s", "y"), col("s"), col("y"))
        .collect()(0).getDouble(0)
    assert(auc(Seq((1.0, false), (2.0, false), (3.0, true), (4.0, true))) == 1.0)
    assert(auc(Seq((1.0, true), (2.0, true), (3.0, false), (4.0, false))) == 0.0)
    assert(auc(Seq((5.0, true), (5.0, false), (5.0, true), (5.0, false))) == 0.5)
    // mixed with ties: pos at {2, 3}, neg at {1, 3} →
    // ranks: 1→1, 2→2, 3→avg(3,4)=3.5; Σpos = 2+3.5 = 5.5;
    // auc = (5.5 − 2·3/2) / (2·2) = 0.625
    assert(auc(Seq((1.0, false), (2.0, true), (3.0, true), (3.0, false))) == 0.625)
  }

  test("rocAuc complement symmetry: AUC(s) + AUC(-s) == 1 (ties included)") {
    val sp = spark
    import sp.implicits._
    val rows = (0 until 120).map(i =>
      ((i % 11).toDouble, i % 4 == 0)).toDF("s", "y")
    def auc(c: org.apache.spark.sql.Column): Double =
      graft.operators.Metrics.rocAuc(rows, c, col("y"))
        .collect()(0).getDouble(0)
    assert(math.abs(auc(col("s")) + auc(-col("s")) - 1.0) < 2e-6)
  }

  test("rocAuc is invariant under input partitioning and more partitions than scores") {
    val sp = spark
    import sp.implicits._
    val rows = (0 until 200).map(i =>
      ((i % 7).toDouble, i % 3 == 0)).toDF("s", "y")
    val a = graft.operators.Metrics.rocAuc(rows, col("s"), col("y"))
      .collect()(0)
    val b = graft.operators.Metrics
      .rocAuc(rows.repartition(31), col("s"), col("y")).collect()(0)
    assert(a == b)
  }

  test("chi2: perfectly-label-aligned token scores N, independent token drops to 0") {
    val sp = spark
    import sp.implicits._
    // 4 docs: 'pos' appears in exactly the en docs, 'all' in every doc
    // (zero margin → filtered), 'half' is independent of the label
    val docs = Seq(
      (0L, "pos half all", "en"), (1L, "pos all", "en"),
      (2L, "half all", "fr"), (3L, "all x", "fr"))
      .toDF("doc_id", "text", "lang")
    val got = graft.operators.TextOps
      .chi2Terms(docs, col("lang") === "en", k = 10)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("pos") == 4.0, got)      // χ² = N for perfect alignment
    assert(got("half") == 0.0, got)     // a=b=1, c=d=1 → numerator 0
    assert(!got.contains("all"), got)   // c+d margin is 0 → undefined
  }

  test("weightedSample: heavier beats heavy even past 2e9, zero weight never drawn") {
    val sp = spark
    import sp.implicits._
    // 98 vs 99: both raw clocks would round to 0.000000000 at 9 dp —
    // the log-domain key keeps the 10x weight ratio decisive
    val rows = ((0 until 50).map(i => (i.toLong, 1L))
      :+ (98L, 1000000000000L) :+ (99L, 10000000000000L)
      :+ (100L, 0L) :+ (101L, -5L))
      .toDF("doc_id", "w")
    val got = graft.operators.Sampling
      .weightedSample(rows, "doc_id", "w", k = 5)
      .collect().map(_.getLong(0))
    assert(got.length == 5)
    assert(got.take(2).toSeq == Seq(99L, 98L),
      s"weight order must decide among heavy rows: ${got.toSeq}")
    assert(!got.contains(100L) && !got.contains(101L))
    val again = graft.operators.Sampling
      .weightedSample(rows.repartition(13), "doc_id", "w", k = 5)
      .collect().map(_.getLong(0))
    assert(got.toSeq == again.toSeq)
  }

  test("editDistanceNearDup: blocked pairs only, length prune is lossless") {
    val sp = spark
    import sp.implicits._
    val docs = Seq(
      (0L, "kitten sat here", "s1"),
      (1L, "sitten sat here", "s1"),  // dist 1 from doc 0
      (2L, "kitten sat here", "s2"),  // identical text, OTHER block
      (3L, "completely different words entirely unrelated", "s1"))
      .toDF("doc_id", "text", "source")
    val got = graft.operators.Dedup
      .editDistanceNearDup(docs, blockCol = "source", maxDist = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((0L, 1L, 1L)), got)
  }

  test("invertedIndex: hand postings, df gates") {
    val sp = spark
    import sp.implicits._
    val docs = Seq(
      (5L, "a b common"), (2L, "a common"), (9L, "b a common"))
      .toDF("doc_id", "text")
    val all = graft.operators.TextOps
      .invertedIndex(docs, minDf = 1, maxDfRatio = 1.0)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getString(2)))
      .toMap
    assert(all("a") == ((3L, "2,5,9")), all)
    assert(all("b") == ((2L, "5,9")), all)
    val gated = graft.operators.TextOps
      .invertedIndex(docs, minDf = 2, maxDfRatio = 0.7)
      .collect().map(_.getString(0)).toSet
    // 'a' and 'common' (df 3 = ratio 1.0) fail the max gate; singletons
    // fail the min gate; only 'b' (df 2, ratio 2/3) survives
    assert(gated == Set("b"), gated)
  }

  test("ppJoin equals the brute-force tau-Jaccard join (100% recall theorem)") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val tau = 0.5 // low tau = worst case for the prefix filter
    val got = graft.operators.Dedup.ppJoin(docs, tau = tau)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val sets = docs.select(
      col("doc_id"),
      graft.operators.Dedup.shingleSetPortable(col("text"), 3).as("ts"))
    val brute = sets.as("a")
      .join(sets.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        round(
          size(array_intersect(col("a.ts"), col("b.ts"))).cast("double")
            / size(array_union(col("a.ts"), col("b.ts"))), 6)
          .as("j"))
      .filter(col("j") >= tau)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(got == brute, s"prefix filter lost pairs: ${brute -- got}")
    assert(got.nonEmpty, "fixture should have tau=0.5 pairs")
  }

  test("ppJoin tau=1 finds exactly the identical-set pairs") {
    val sp = spark
    import sp.implicits._
    val docs = Seq(
      (1L, "a b c d"), (2L, "a b c d"), (3L, "a b c e"))
      .toDF("doc_id", "text")
    val got = graft.operators.Dedup.ppJoin(docs, tau = 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L)), got)
  }

  test("rrfFuse hand value: overlap beats single-list, ties break by id") {
    val sp = spark
    import sp.implicits._
    val l1 = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("doc_id", "rank")
    val l2 = Seq((20L, 1), (40L, 2)).toDF("doc_id", "rank")
    val got = graft.operators.Metrics.rrfFuse(Seq(l1, l2), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    // doc 20: 1/62 + 1/61 ≈ 0.032524; doc 10: 1/61; doc 40: 1/62; doc 30: 1/63
    assert(got.map(_._1).toSeq == Seq(20L, 10L, 40L, 30L), got.toSeq)
    assert(got(0)._3 == 2 && got(1)._3 == 1)
    def r9(x: Double) = BigDecimal(x)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(0)._2 == r9(1.0 / 62 + 1.0 / 61), got(0))
  }

  test("calibrationBins: perfectly-calibrated halves land on zero gap") {
    val sp = spark
    import sp.implicits._
    // bins of {0.0 scores, all negative} and {1.0 scores, all positive}:
    // mean_score == pos_rate in both bins → gap 0
    val rows = ((0 until 10).map(i => (i.toLong, 0.0, false))
      ++ (10 until 20).map(i => (i.toLong, 1.0, true)))
      .toDF("id", "s", "y")
    val got = graft.operators.Metrics
      .calibrationBins(rows, col("s"), col("y"), col("id"), bins = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getDouble(3), r.getDouble(4))).sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, 10L, 0.0, 0.0, 0.0), (2L, 10L, 1.0, 1.0, 0.0)), got.toSeq)
  }

  test("winsorize hand value: clip counts and winsorized mean") {
    val sp = spark
    import sp.implicits._
    // one group, values 1..10: p05 = 1.45, p95 = 9.55 ((n−1)·p interp);
    // 1 clips low, 10 clips high; mean = (1.45+2+..+9+9.55)/10 = 5.5
    val df = (1 to 10).map(v => ("g", v.toDouble)).toDF("grp", "value")
    val r = graft.operators.Metrics
      .winsorize(df, col("grp"), col("value")).collect()(0)
    assert(r.getLong(1) == 10)
    assert(r.getLong(2) == 1 && r.getLong(3) == 1, r)
    assert(r.getDouble(5) == 1.45 && r.getDouble(6) == 9.55, r)
    assert(r.getDouble(4) == 5.5, r)
  }
}
