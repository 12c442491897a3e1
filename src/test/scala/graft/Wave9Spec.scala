package graft

import graft.operators.{CountMin, Dedup}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-12 wave: winnowing fingerprints (d51, Schleimer et al. 2003)
  * and the Count-Min sketch (d53, Cormode–Muthukrishnan 2005).
  */
class WinnowingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  private def docs(rows: Seq[(Long, String)]): DataFrame = {
    val sp = spark
    import sp.implicits._
    rows.toDF("doc_id", "text")
  }

  /** The operator's 60-bit md5 digest, reproduced on the JVM. */
  private def md60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val hex = d.map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** Reference winnowing (the paper's definition, literal): gram hashes,
    * every window of w consecutive hashes selects its minimum (rightmost
    * position on ties), selections form a distinct set.
    */
  private def refWinnow(
      toks: Seq[String], k: Int, w: Int): Set[(Long, Long)] = {
    val grams = toks.sliding(k).filter(_.length == k)
      .map(g => md60(g.mkString(" "))).toArray
    if (grams.length < w) Set.empty
    else (0 to grams.length - w).map { p =>
      val win = (p until p + w)
      val mn = win.map(grams).min
      val sel = win.filter(grams(_) == mn).max
      (sel.toLong, grams(sel))
    }.toSet
  }

  test("the paper's guarantee: a shared run of w+k-1 tokens shares a fingerprint") {
    // k=4, w=4 → any match of ≥ 7 tokens must surface; docs share
    // EXACTLY 7 tokens, everything else globally unique
    val shared = (1 to 7).map(i => s"s$i").mkString(" ")
    val d = docs(Seq(
      0L -> s"u1 u2 u3 $shared u4 u5 u6",
      1L -> s"v1 $shared v2 v3 v4 v5 v6"))
    val fps = Dedup.winnowFingerprints(d, k = 4, w = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val a = fps.collect { case (0L, f) => f }.toSet
    val b = fps.collect { case (1L, f) => f }.toSet
    assert((a intersect b).nonEmpty,
      "w+k-1 shared run produced no shared fingerprint")
    // and the pair stage surfaces it at minShared=1
    val pairs = Dedup.winnowPairs(d, k = 4, w = 4, minShared = 1,
      maxDf = 50).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((0L, 1L)))
  }

  test("below the guarantee threshold nothing is promised OR selected here") {
    // share only k-1 = 3 tokens: no common gram even exists
    val shared = "s1 s2 s3"
    val d = docs(Seq(
      0L -> s"u1 u2 $shared u3 u4 u5",
      1L -> s"v1 v2 $shared v3 v4 v5"))
    val fps = Dedup.winnowFingerprints(d, k = 4, w = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val a = fps.collect { case (0L, f) => f }.toSet
    val b = fps.collect { case (1L, f) => f }.toSet
    assert((a intersect b).isEmpty)
  }

  test("generative: selection equals the paper's definition exactly") {
    val k = 4; val w = 4
    val rnd = new scala.util.Random(7)
    val vocab = Array("a", "b", "c", "d", "e", "f")
    val corpus = (0L until 25L).map(i =>
      i -> Seq.fill(7 + rnd.nextInt(30))(vocab(rnd.nextInt(6)))
        .mkString(" "))
    val expect = corpus.flatMap { case (id, t) =>
      refWinnow(t.split(" ").toSeq, k, w).map { case (p, h) => (id, p, h) }
    }.toSet
    val got = Dedup.winnowFingerprints(docs(corpus), k, w)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expect,
      s"missing=${(expect -- got).take(3)} extra=${(got -- expect).take(3)}")
    assert(got.nonEmpty)
  }

  test("density: every doc keeps between ceil(nWin/w) and nWin fingerprints") {
    // one selection can cover at most w consecutive windows, so the
    // sketch can never be sparser than nWin/w — the winnowing
    // lower-bound that makes coverage (not just expectation) a theorem
    val k = 4; val w = 4
    val rnd = new scala.util.Random(11)
    val vocab = Array("a", "b", "c", "d", "e")
    val corpus = (0L until 15L).map(i =>
      i -> Seq.fill(12 + rnd.nextInt(25))(vocab(rnd.nextInt(5)))
        .mkString(" "))
    val counts = Dedup.winnowFingerprints(docs(corpus), k, w)
      .groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for ((id, t) <- corpus) {
      val nGrams = t.split(" ").length - k + 1
      val nWin = nGrams - w + 1
      if (nWin >= 1) {
        val c = counts.getOrElse(id, 0L)
        assert(c >= (nWin + w - 1) / w, s"doc $id too sparse: $c")
        assert(c <= nWin.toLong, s"doc $id too dense: $c")
      } else assert(!counts.contains(id))
    }
  }

  test("fingerprints are invariant under input partitioning") {
    val rnd = new scala.util.Random(3)
    val vocab = Array("a", "b", "c", "d")
    val corpus = (0L until 12L).map(i =>
      i -> Seq.fill(10 + rnd.nextInt(15))(vocab(rnd.nextInt(4)))
        .mkString(" "))
    val one = Dedup.winnowFingerprints(docs(corpus).coalesce(1), 4, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val many = Dedup.winnowFingerprints(docs(corpus).repartition(7), 4, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(one == many)
  }

  test("stop-fingerprint cut: a boilerplate gram in >maxDf docs never pairs") {
    // 6 IDENTICAL boilerplate docs: every selected fingerprint has
    // df exactly 6, so maxDf=5 drops all of them — no pair survives
    // on corpus-universal boilerplate
    val boiler = (1 to 12).map(i => s"b$i").mkString(" ")
    val d = docs((0L until 6L).map(i => i -> boiler))
    val pairs = Dedup.winnowPairs(d, k = 4, w = 4, minShared = 1, maxDf = 5)
    assert(pairs.count() == 0)
    // raising the cap to 6 re-admits them
    val loose = Dedup.winnowPairs(d, k = 4, w = 4, minShared = 1, maxDf = 6)
    assert(loose.count() == 15, "all C(6,2) pairs should surface")
  }
}

/** e27 IVF delete: the partition-pruned rewrite's blast radius and the
  * fully-emptied-list directory removal.
  */
class IvfDeleteSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def lists(tmp: String): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("e", ArrayType(DoubleType)),
      StructField("nrm", DoubleType),
      StructField("c_id", LongType)))
    spark.read.schema(schema).parquet(s"$tmp/lists")
  }

  private def listDirState(tmp: String): Map[String, Set[(String, Long)]] = {
    val root = new java.io.File(s"$tmp/lists")
    root.listFiles().filter(_.isDirectory).map { d =>
      d.getName -> d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getName, f.lastModified())).toSet
    }.toMap
  }

  private def withIndex[T](nList: Int)(f: (String, DataFrame) => T): T = {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val idx = graft.operators.Similarity.buildIvfIndex(emb, nList)
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_ivf_delspec").toString
    try {
      graft.operators.Similarity.writeIvfIndex(idx, tmp)
      idx.release()
      f(tmp, emb)
    } finally {
      import scala.jdk.CollectionConverters._
      val root = java.nio.file.Paths.get(tmp)
      java.nio.file.Files.walk(root).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("blast radius: only list dirs holding a deleted id are rewritten") {
    withIndex(8) { (tmp, _) =>
      val byList = lists(tmp).select("c_id", "vec_id").collect()
        .map(r => r.getLong(0) -> r.getLong(1))
      val target = byList.map(_._1).min
      val victim = byList.filter(_._1 == target).map(_._2).min
      val before = listDirState(tmp)
      val sp = spark
      import sp.implicits._
      val affected = graft.operators.Similarity.deleteFromIvfIndex(
        spark, tmp, Seq(victim).toDF("vec_id"))
      assert(affected == Seq(target), s"blast radius $affected")
      val after = listDirState(tmp)
      // untouched lists: identical file names AND mtimes
      for ((d, files) <- before if d != s"c_id=$target")
        assert(after(d) == files, s"untouched dir $d was rewritten")
      assert(after(s"c_id=$target") != before(s"c_id=$target"))
      // the victim is gone, nothing else is
      val ids = lists(tmp).select("vec_id").collect()
        .map(_.getLong(0)).toSet
      assert(!ids.contains(victim))
      assert(ids.size == byList.length - 1)
    }
  }

  test("deleting a whole list removes its directory; reopen sees no ghosts") {
    withIndex(8) { (tmp, _) =>
      val byList = lists(tmp).select("c_id", "vec_id").collect()
        .map(r => r.getLong(0) -> r.getLong(1))
      val target = byList.map(_._1).min
      val victims = byList.filter(_._1 == target).map(_._2)
      val sp = spark
      import sp.implicits._
      val affected = graft.operators.Similarity.deleteFromIvfIndex(
        spark, tmp, victims.toSeq.toDF("vec_id"))
      assert(affected == Seq(target))
      assert(!new java.io.File(s"$tmp/lists/c_id=$target").exists(),
        "emptied list directory must be removed")
      val re = lists(tmp)
      assert(re.filter(col("c_id") === target).count() == 0)
      assert(re.count() == byList.length - victims.length)
    }
  }

  test("append then delete round-trip keeps the survivors exact") {
    withIndex(8) { (tmp, emb) =>
      // append a re-keyed copy of 5 vectors, then delete them again:
      // the index must equal its pre-append state row-for-row
      val pre = lists(tmp).select("vec_id", "c_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val extra = emb.filter(col("vec_id") < 5)
        .withColumn("vec_id", col("vec_id") + 100000L)
      graft.operators.Similarity.appendToIvfIndex(spark, tmp, extra)
      val sp = spark
      import sp.implicits._
      graft.operators.Similarity.deleteFromIvfIndex(
        spark, tmp,
        (0L until 5L).map(_ + 100000L).toDF("vec_id"))
      val post = lists(tmp).select("vec_id", "c_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(post == pre, "append+delete did not round-trip")
    }
  }
}

/** g51 sampled harmonic centrality: hand-checkable distances and the
  * disconnected-graph finiteness that distinguishes harmonic from
  * classic closeness.
  */
class HarmonicSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  private def edges(rows: Seq[(Long, Long)]): DataFrame = {
    val sp = spark
    import sp.implicits._
    rows.toDF("src", "dst")
  }

  test("path graph from one seed: H(v) = 1/d, stop depth = eccentricity") {
    val e = edges(Seq(0L -> 1L, 1L -> 2L, 2L -> 3L))
    val (h, stop) = graft.operators.Brandes.sampledHarmonic(
      e, Seq(0L), maxDepth = 64)
    assert(stop == 3, s"stopDepth $stop != path eccentricity 3")
    val m = h.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(m == Map(1L -> 1.0, 2L -> 0.5, 3L -> 0.333333), m.toString)
  }

  test("two seeds sum; a disconnected island contributes nothing but stays finite") {
    // component A: 0-1-2 (seeds 0 and 1); island B: 10-11 (no seed) —
    // island vertices simply receive nothing; component vertices sum
    // over BOTH seeds (harmonic's whole point vs classic closeness)
    val e = edges(Seq(0L -> 1L, 1L -> 2L, 10L -> 11L))
    val (h, _) = graft.operators.Brandes.sampledHarmonic(
      e, Seq(0L, 1L), maxDepth = 64)
    val m = h.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // from seed 0: 1→1, 2→1/2; from seed 1: 0→1, 2→1
    assert(m == Map(0L -> 1.0, 1L -> 1.0, 2L -> 1.5), m.toString)
    assert(!m.contains(10L) && !m.contains(11L))
  }

  test("harmonic agrees with a brute-force BFS reference on a random graph") {
    val rnd = new scala.util.Random(5)
    val es = (0 until 120).map(_ =>
      (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b }.distinct
    val adj = es.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val seeds = adj.keySet.toSeq.sorted.take(4)
    def bfs(s: Long): Map[Long, Int] = {
      var dist = Map(s -> 0); var frontier = Set(s); var d = 1
      while (frontier.nonEmpty) {
        val next = frontier.flatMap(adj.getOrElse(_, Set.empty))
          .diff(dist.keySet)
        next.foreach(v => dist += v -> d)
        frontier = next; d += 1
      }
      dist
    }
    val expect = seeds.flatMap(s => bfs(s).toSeq.filter(_._2 > 0))
      .groupBy(_._1)
      .map { case (v, ds) =>
        v -> BigDecimal(ds.map(1.0 / _._2).sum)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    val got = graft.operators.Brandes.sampledHarmonic(
      edges(es), seeds, maxDepth = 64)._1.collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet == expect.keySet)
    for ((v, hv) <- expect)
      assert(math.abs(got(v) - hv) < 2e-6, s"vertex $v: ${got(v)} vs $hv")
  }
}

/** d54 BPE encode: applying the trained merges to the corpus — the
  * conservation and monotonicity laws any correct encoder obeys.
  */
class BpeEncodeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  private def docs(rows: Seq[(Long, String)]): DataFrame = {
    val sp = spark
    import sp.implicits._
    rows.toDF("doc_id", "text")
  }

  private val corpus = docs(Seq(
    0L -> "aa ab aab aab",
    1L -> "ab ab aa b",
    2L -> "aab b aa"))

  test("character mass is conserved: sum(cnt*len(subword)) = corpus chars") {
    val chars = Seq("aa ab aab aab", "ab ab aa b", "aab b aa")
      .flatMap(_.split(" ")).map(_.length).sum
    for (k <- 1 to 3) {
      val enc = graft.operators.TextOps.bpeEncode(corpus, k).collect()
      val mass = enc.map(r => r.getString(0).length * r.getLong(1)).sum
      assert(mass == chars, s"k=$k lost characters: $mass vs $chars")
    }
  }

  test("token count shrinks monotonically with more merges") {
    val totals = (1 to 3).map { k =>
      graft.operators.TextOps.bpeEncode(corpus, k).collect()
        .map(_.getLong(1)).sum
    }
    assert(totals.zip(totals.tail).forall { case (a, b) => b <= a },
      s"not monotone: $totals")
  }

  test("merge exhaustion before round k passes the table through (oracle-matched)") {
    // every word is 'ab': round 1 merges (a,b); round 2 finds no pair
    // and must NOT empty the table — the engine's exhausted branch and
    // the oracle's NULL-sentinel bb CTE both pass syms through
    val d = docs(Seq(0L -> "ab ab", 1L -> "ab"))
    val enc = graft.operators.TextOps.bpeEncode(d, 3).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(enc == Map("ab" -> 3L), enc.toString)
  }

  test("hand fixture: the first merge is the argmax pair, applied l2r") {
    // word counts: aa=3, ab=3, aab=3, b=2. Pair counts: (a,a) = 3 (aa)
    // + 3 (aab) = 6; (a,b) = 3 (ab) + 3 (aab) = 6 — a TIE, broken
    // lexicographic ascending ⇒ merge (a,a) → "aa"
    val m = graft.operators.TextOps.bpeMerges(corpus, 1).collect()
    assert(m.length == 1 && m(0).getString(1) == "a"
      && m(0).getString(2) == "a" && m(0).getLong(3) == 6L,
      m.mkString(","))
    val enc = graft.operators.TextOps.bpeEncode(corpus, 1).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // aa→[aa]×3; ab→[a,b]×3; aab→[aa,b]×3 (l2r eats the first two);
    // b→[b]×2 ⇒ aa: 6, a: 3, b: 8
    assert(enc == Map("aa" -> 6L, "a" -> 3L, "b" -> 8L), enc.toString)
  }
}

/** p8 hygiene journey: the composed invariants each stage must leave
  * behind, re-checked through the component operators.
  */
class HygieneJourneySpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("survivors pass every gate, dedup held, token arithmetic closes") {
    import graft.operators.TextOps
    val out = SparkEntry.queries("p8_hygiene")(spark, dir).collect()
    assert(out.nonEmpty, "journey dropped the whole corpus")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val langOk = docs
      .select(col("doc_id"), TextOps.languageGuess(col("text")).as("lg"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // the gate is row-local, so checking it over the full corpus gives
    // the same per-doc verdict as the journey's gated subset
    val gateOk = TextOps.filterPipeline(docs)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val texts = out.map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    for ((id, nTok, nRem, clean) <- texts) {
      assert(langOk(id) == "en", s"doc $id not English-gated")
      assert(gateOk(id), s"doc $id failed the quality gate")
      assert(nRem >= 0 && nRem < nTok, s"doc $id arithmetic: $nRem/$nTok")
      val cleanToks = if (clean.isEmpty) 0 else clean.split(" ").length
      assert(cleanToks == nTok - nRem, s"doc $id token count mismatch")
    }
    // exact dedup held: no two survivors share a cleaned text
    val dups = texts.groupBy(_._4).filter(_._2.length > 1)
    assert(dups.isEmpty, s"duplicate cleaned texts survived: ${dups.keys.take(2)}")
    // the journey actually bites at this SF: some doc was span-cleaned
    assert(texts.exists(_._3 > 0), "no span was ever removed — vacuous fixture")
  }

  test("p8b ledger: total, kept-set equality with p8, and dedup pointers resolve") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val ledger = SparkEntry.queries("p8b_hygiene_ledger")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(ledger.length == docs.count(), "one ledger row per corpus doc")
    val keptIds = ledger.collect { case (id, "kept", d) =>
      assert(d == "ok"); id
    }.toSet
    val p8Ids = SparkEntry.queries("p8_hygiene")(spark, dir)
      .collect().map(_.getLong(0)).toSet
    assert(keptIds == p8Ids, "ledger 'kept' set != p8 survivors")
    // every dedup pointer names a doc the journey actually kept
    for ((id, st, d) <- ledger if st == "exact_dedup") {
      assert(keptIds.contains(d.toLong), s"doc $id points at dropped $d")
      assert(d.toLong < id, "min-id rule: the keeper is the smallest twin")
    }
    // the ledger's stage vocabulary is exactly the journey's stages
    val stages = ledger.map(_._2).toSet
    assert(stages.subsetOf(
      Set("lang", "quality", "span_removal", "exact_dedup", "kept")))
    assert(stages.contains("kept") && stages.size >= 2,
      s"fixture exercises too few stages: $stages")
  }
}

/** q47 (exact interpolated percentiles) is the measured exact twin of
  * q20's KLL sketch — the pair differential locks the sketch's accuracy
  * against the exact path on the same fixture.
  */
class MedianPairSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q20 sketch percentiles track q47 exact within 2% per group") {
    val exact = SparkEntry.queries("q47_median")(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val approx = SparkEntry.queries("q20_approx_percentiles")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(exact.keySet == approx.keySet)
    for ((g, (m, p90)) <- exact) {
      val (am, ap) = approx(g)
      assert(math.abs(am - m) <= 0.02 * m, s"$g median drift: $am vs $m")
      assert(math.abs(ap - p90) <= 0.02 * p90, s"$g p90 drift: $ap vs $p90")
    }
  }
}

class CountMinSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  private def docs(rows: Seq[(Long, String)]): DataFrame = {
    val sp = spark
    import sp.implicits._
    rows.toDF("doc_id", "text")
  }

  private def md60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val hex = d.map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** Reference CMS (the definition, literal): depth×width counters,
    * cell = md60("cms-v1:r:tok") mod width, est = min over rows.
    */
  private def refCms(
      tokens: Seq[String], depth: Int, width: Int): Map[String, Long] = {
    val table = Array.fill(depth, width)(0L)
    for (t <- tokens; r <- 0 until depth)
      table(r)((md60(s"cms-v1:$r:$t") % width).toInt) += 1
    tokens.distinct.map { t =>
      t -> (0 until depth).map(r =>
        table(r)((md60(s"cms-v1:$r:$t") % width).toInt)).min
    }.toMap
  }

  private val rnd = new scala.util.Random(19)
  private val vocab = (1 to 40).map(i => s"w$i")
  private val corpus = (0L until 40L).map(i =>
    i -> Seq.fill(5 + rnd.nextInt(40))(vocab(rnd.nextInt(40)))
      .mkString(" "))

  test("estimates equal the definition, and est >= true always (CMS theorem)") {
    // width 8 forces real collisions: the over-estimate side of the
    // theorem is exercised, not just the identity case
    val truth = corpus.flatMap(_._2.split(" ")).groupBy(identity)
      .map { case (t, o) => t -> o.length.toLong }
    val ref = refCms(corpus.flatMap(_._2.split(" ")), depth = 3, width = 8)
    val got = CountMin.pointEstimates(docs(corpus), depth = 3, width = 8)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length == truth.size)
    var sawCollision = false
    for ((tok, ct, est, over) <- got) {
      assert(ct == truth(tok), s"true count wrong for $tok")
      assert(est == ref(tok), s"estimate != definition for $tok")
      assert(est >= ct, s"CMS under-estimated $tok: $est < $ct")
      assert(over == est - ct)
      if (over > 0) sawCollision = true
    }
    assert(sawCollision,
      "width-8 fixture produced zero collisions — test is vacuous")
  }

  test("mergeability: shard sketches sum cell-wise to the corpus sketch") {
    val sp = spark
    import sp.implicits._
    val all = docs(corpus)
    def toks(d: DataFrame) = d
      .filter(length(trim(col("text"))) > 0)
      .select(explode(split(trim(col("text")), "\\s+")).as("t"))
    val whole = CountMin.sketch(toks(all), depth = 3, width = 16)
      .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
    val a = CountMin.sketch(
      toks(all.filter(col("doc_id") < 20)), depth = 3, width = 16)
      .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
    val b = CountMin.sketch(
      toks(all.filter(col("doc_id") >= 20)), depth = 3, width = 16)
      .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
    val merged = (a.keySet ++ b.keySet).map(k =>
      k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap
    assert(merged == whole, "cell-wise shard sum != corpus sketch")
  }

  test("sketch size is bounded by depth*width regardless of corpus") {
    val big = docs(corpus ++ corpus.map { case (i, t) => (i + 100L) -> t })
    val toks = big.select(explode(split(trim(col("text")), "\\s+")).as("t"))
    assert(CountMin.sketch(toks, depth = 3, width = 8).count() <= 24)
  }

  test("estimates are invariant under input partitioning") {
    val one = CountMin.pointEstimates(docs(corpus).coalesce(1), 3, 16)
      .collect().map(r => (r.getString(0), r.getLong(2))).toSet
    val many = CountMin.pointEstimates(docs(corpus).repartition(9), 3, 16)
      .collect().map(r => (r.getString(0), r.getLong(2))).toSet
    assert(one == many)
  }

  test("streaming sketch state converges to the batch sketch (st19 path)") {
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    def toks(d: DataFrame) = d
      .filter(length(trim(col("text"))) > 0)
      .select(explode(split(trim(col("text")), "\\s+")).as("t"))
    val batch = CountMin.sketch(toks(docs(corpus)), 3, 16)
      .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
    val ms = MemoryStream[(Long, String)]
    val qn = "cms_mem_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = CountMin.sketch(toks(ms.toDS().toDF("doc_id", "text")), 3, 16)
      .writeStream.format("memory").queryName(qn)
      .outputMode("complete").start()
    try {
      corpus.grouped(corpus.length / 3 + 1).foreach { b =>
        ms.addData(b.toIndexedSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = spark.table(qn)
      .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
    assert(streamed == batch, "converged streaming sketch != batch sketch")
  }
}
