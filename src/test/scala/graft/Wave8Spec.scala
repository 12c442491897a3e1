package graft

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 wave: exact substring-level dedup (d50, Lee et al. 2022
  * ExactSubstr).
  */
class SubstringDedupSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  private def docs(rows: Seq[(Long, String)]): DataFrame = {
    val sp = spark
    import sp.implicits._
    rows.toDF("doc_id", "text")
  }

  test("a known cross-doc span surfaces as one maximal run per doc") {
    // an 8-token span S shared by docs 0 and 1; every other token is
    // globally unique, so S's interior k-grams are the only duplicates
    val s8 = (1 to 8).map(i => s"s$i").mkString(" ")
    val d = docs(Seq(
      0L -> s"u1 u2 $s8 v1 v2",
      1L -> s"$s8 w1 w2 w3"))
    val got = Dedup.substringSpans(d, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    // doc 0: S sits at token positions 2..9 → dup grams start 2..5
    // doc 1: S sits at 0..7 → dup grams start 0..3
    assert(got == Set(
      (0L, 2L, 9L, 8L, 4L),
      (1L, 0L, 7L, 8L, 4L)), s"spans wrong: $got")
  }

  test("within-doc repetition is span-duplicated too (same-doc sites)") {
    val r5 = (1 to 5).map(i => s"r$i").mkString(" ")
    val d = docs(Seq(
      2L -> s"m1 m2 $r5 m3 m4 $r5 m5"))
    val got = Dedup.substringSpans(d, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    // R occurs at positions 2..6 and 9..13 — two separate maximal runs,
    // each exactly one duplicated 5-gram long
    assert(got == Set(
      (2L, 2L, 6L, 5L, 1L),
      (2L, 9L, 13L, 5L, 1L)), s"spans wrong: $got")
  }

  test("no duplicated gram → empty output; short docs never emit grams") {
    val d = docs(Seq(
      3L -> "a1 a2 a3 a4 a5 a6",
      4L -> "b1 b2 b3")) // < k tokens: contributes nothing
    assert(Dedup.substringSpans(d, k = 5).count() == 0)
  }

  test("spans are invariant under input partitioning") {
    val s8 = (1 to 8).map(i => s"x$i").mkString(" ")
    val rows = (0L to 19L).map(i =>
      i -> s"p${i}a p${i}b $s8 q${i}a q${i}b")
    val a = Dedup.substringSpans(docs(rows), k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = Dedup.substringSpans(docs(rows).repartition(13), k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a == b && a.size == 20, s"got ${a.size} spans")
  }

  test("span removal keeps the canonical (min-site) occurrence only") {
    val s8 = (1 to 8).map(i => s"s$i").mkString(" ")
    val d = docs(Seq(
      0L -> s"u1 u2 $s8 v1 v2",
      1L -> s"$s8 w1 w2 w3"))
    val got = Dedup.removeDuplicatedSpans(d, k = 5).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    // canonical site of the leading gram is (0, 2) — doc 0 keeps all,
    // doc 1 loses its 8 span tokens
    assert(got(0L) == (12L, 0L, s"u1 u2 $s8 v1 v2"), s"doc0: ${got(0L)}")
    assert(got(1L) == (11L, 8L, "w1 w2 w3"), s"doc1: ${got(1L)}")
  }

  test("within-doc repetition keeps the first occurrence") {
    val r5 = (1 to 5).map(i => s"r$i").mkString(" ")
    val d = docs(Seq(2L -> s"m1 m2 $r5 m3 m4 $r5 m5"))
    val got = Dedup.removeDuplicatedSpans(d, k = 5).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getString(3))).head
    assert(got == (15L, 5L, s"m1 m2 $r5 m3 m4 m5"), s"got $got")
  }

  test("a fully-duplicated doc still emits its (empty) row") {
    val s6 = (1 to 6).map(i => s"z$i").mkString(" ")
    val d = docs(Seq(0L -> s6, 1L -> s6))
    val got = Dedup.removeDuplicatedSpans(d, k = 5).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(got(0L) == (6L, 0L, s6))
    assert(got(1L) == (6L, 6L, ""), s"doc1 not emptied: ${got(1L)}")
  }

  test("untouched docs pass through verbatim (single-spaced)") {
    val d = docs(Seq(7L -> "a1  a2\ta3 a4 a5 a6"))
    val got = Dedup.removeDuplicatedSpans(d, k = 5).collect().head
    assert(got.getString(3) == "a1 a2 a3 a4 a5 a6")
    assert(got.getLong(2) == 0L)
  }

  test("overlap chain: a substring may lose every site (documented conservative edge)") {
    // H = (h t1..t4) duplicated at doc0@0 / doc1@2; G = (t1..t5) at
    // doc1@3 / doc2@0. doc0's span is canonical for H and survives;
    // doc1's span [2..7] is non-canonical for H → cut (taking G's copy
    // with it); doc2's span is non-canonical for G → cut. The string
    // t1..t5 then survives NOWHERE — the precise rule the Scaladoc
    // states (one occurrence per maximal SPAN, not per substring;
    // strictly more conservative removal, bounded by the paper's
    // cut-every-occurrence released tool).
    val d = docs(Seq(
      0L -> "h t1 t2 t3 t4 u1 u2 u3",
      1L -> "m1 m2 h t1 t2 t3 t4 t5 n1 n2",
      2L -> "t1 t2 t3 t4 t5 q1 q2 q3"))
    val got = Dedup.removeDuplicatedSpans(d, k = 5).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    assert(got(0L) == (0L, "h t1 t2 t3 t4 u1 u2 u3"), got(0L).toString)
    assert(got(1L) == (6L, "m1 m2 n1 n2"), got(1L).toString)
    assert(got(2L) == (5L, "q1 q2 q3"), got(2L).toString)
  }

  test("generative: spans are exactly the maximal duplicated-gram runs") {
    // deterministic random corpus over a tiny vocab (lots of genuine
    // collisions), then the operator's output is checked against the
    // DEFINITION: soundness — every k-window inside a reported span is
    // a corpus-duplicated gram; completeness — every corpus-duplicated
    // gram position lies inside some reported span; maximality — spans
    // per doc are disjoint and non-adjacent
    val k = 5
    val rnd = new scala.util.Random(42)
    val vocab = Array("a", "b", "c", "d", "e", "f", "g", "h")
    val corpus = (0L until 30L).map(i =>
      i -> Seq.fill(10 + rnd.nextInt(21))(vocab(rnd.nextInt(8)))
        .mkString(" "))
    val tokens = corpus.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
    val gramCount = new scala.collection.mutable.HashMap[Seq[String], Int]()
    for ((_, tk) <- tokens; w <- tk.sliding(k) if w.length == k)
      gramCount(w) = gramCount.getOrElse(w, 0) + 1
    // flatMap over a Seq, NOT the Map — a Map's flatMap re-keys by the
    // tuple's first element and silently collapses to one pos per doc
    val dupPos = tokens.toSeq.flatMap { case (id, tk) =>
      tk.sliding(k).zipWithIndex.collect {
        case (w, p) if w.length == k && gramCount(w) >= 2 => (id, p.toLong)
      }
    }.toSet
    val spans = Dedup.substringSpans(docs(corpus), k).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4)))
    assert(spans.nonEmpty, "tiny-vocab corpus produced no dup spans")
    // soundness + the n_dup_grams arithmetic invariant
    for ((id, s, e, n) <- spans) {
      assert(n == e - s + 1 - (k - 1), s"gram count wrong for ($id,$s,$e)")
      for (p <- s to (e - k + 1))
        assert(dupPos.contains((id, p)), s"non-dup gram inside span: $id $p")
    }
    // completeness
    val covered = spans.flatMap { case (id, s, e, _) =>
      (s to (e - k + 1)).map(p => (id, p))
    }.toSet
    assert(dupPos == covered,
      s"missed dup positions: ${(dupPos -- covered).take(5)}")
    // maximality: per-doc spans disjoint and separated by >= 1 position
    for ((id, ss) <- spans.groupBy(_._1)) {
      val sorted = ss.sortBy(_._2)
      for (Array(a, b) <- sorted.sliding(2).map(_.toArray)
             if sorted.length >= 2)
        assert(b._2 > a._3 - k + 2, s"adjacent spans not merged in doc $id")
    }
    // removal conservation on the same corpus: kept tokens = original
    // minus removed, and the clean text is a subsequence of the original
    val cleaned = Dedup.removeDuplicatedSpans(docs(corpus), k).collect()
    for (r <- cleaned) {
      val orig = tokens(r.getLong(0))
      val clean =
        if (r.getString(3).isEmpty) Seq.empty[String]
        else r.getString(3).split(" ").toSeq
      assert(clean.length == r.getLong(1) - r.getLong(2))
      // subsequence check
      var i = 0
      for (t <- clean) {
        while (i < orig.length && orig(i) != t) i += 1
        assert(i < orig.length, s"clean text not a subsequence: doc ${r.getLong(0)}")
        i += 1
      }
    }
  }
}

/** Round-11 wave: sketch-edge approx twins for the last two global
  * sorts (q45b RFM, d49b calibration bins).
  */
class ApproxTwinSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"

  test("d49b: sketch bins track the exact ntile bins") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val scored = graft.operators.TextOps.qualityMetrics(docs)
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
    val rows = graft.operators.Metrics.calibrationBinsApprox(
      scored, col("stopword_ratio"), col("lang") === "en", bins = 10)
      .collect()
    val approx = rows.map(r => r.getLong(0) ->
      (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toMap
    val n = scored.count()
    // DENSE domain: all 10 bins present even if score ties empty some
    assert(approx.keySet == (1L to 10L).toSet, s"sparse bins: $approx")
    // empty bins carry NULL means, populated bins never do
    assert(approx.values.forall { case (cnt, m) => (cnt == 0) == m.isEmpty })
    // nothing lost, bins near-equal (ties in the score can legitimately
    // imbalance rank-free binning — allow 3x), mean scores monotone
    assert(approx.values.map(_._1).sum == n)
    val ideal = n.toDouble / 10
    assert(approx.values.forall(_._1 <= 3 * ideal),
      s"a sketch bin is pathologically oversized: $approx")
    val means = approx.toSeq.sortBy(_._1).flatMap(_._2._2)
    assert(means == means.sorted, s"mean_score not monotone: $means")
  }

  test("q45b: sketch quartile scores agree with exact ntile scores") {
    val exact = SparkEntry.queries("q45_rfm")(spark, sf)
      .select(col("user_id"), col("r_score"), col("f_score"),
        col("m_score"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val approx = SparkEntry.queries("q45b_rfm_approx")(spark, sf)
      .select(col("user_id"), col("r_score"), col("f_score"),
        col("m_score"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(approx.keySet == exact.keySet, "user universes differ")
    // per-dimension agreement: ntile breaks boundary ties by user_id,
    // the sketch by edge value — only boundary users may differ
    val dims = Seq[((Long, Long, Long)) => Long](_._1, _._2, _._3)
    for ((f, nm) <- dims.zip(Seq("r", "f", "m"))) {
      val agree = exact.keys.count(k => f(exact(k)) == f(approx(k)))
      val frac = agree.toDouble / exact.size
      assert(frac >= 0.9, s"$nm-score agreement only $frac")
      // never off by more than one quartile
      assert(exact.keys.forall(k =>
        math.abs(f(exact(k)) - f(approx(k))) <= 1),
        s"$nm-score off by > 1 quartile somewhere")
    }
  }
}

/** Round-11 wave: convergent sampled Brandes (g45b). */
class BrandesConvergedSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  private def fixture = {
    val e = graft.sources.SyntheticGraph.portable(spark, 300, 600, "g45")
    val seeds = graft.operators.GraphBuilder.vertices(e)
      .orderBy(col("id")).limit(4).collect().map(_.getLong(0)).toSeq
    (e, seeds)
  }

  test("converged result equals fixed-depth for any depth >= stop depth") {
    val (e, seeds) = fixture
    val (conv, stop) =
      graft.operators.Brandes.sampledBetweennessConverged(e, seeds)
    assert(stop >= 1 && stop < 64, s"suspicious stop depth $stop")
    val a = conv.collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    val fixed = graft.operators.Brandes
      .sampledBetweenness(e, seeds, depth = stop + 2)
    val b = fixed.collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(a == b, "converged != fixed-depth past the frontier drain")
  }

  test("early stop really stops: maxDepth far above stop is not walked") {
    val (e, seeds) = fixture
    val (_, s64) =
      graft.operators.Brandes.sampledBetweennessConverged(e, seeds, 64)
    val (_, s32) =
      graft.operators.Brandes.sampledBetweennessConverged(e, seeds, 32)
    assert(s64 == s32, "stop depth must be maxDepth-independent")
  }

  test("depth-bounded variant is a strict truncation when depth < stop") {
    val (e, seeds) = fixture
    val (conv, stop) =
      graft.operators.Brandes.sampledBetweennessConverged(e, seeds)
    val shallow = graft.operators.Brandes
      .sampledBetweenness(e, seeds, depth = math.max(stop - 4, 1))
    // κ-path truncation reaches no deeper than the converged walk; the
    // two must differ somewhere (this fixture's eccentricity > 4)
    val a = conv.collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val b = shallow.collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(a != b, "truncated walk unexpectedly identical to converged")
  }
}
