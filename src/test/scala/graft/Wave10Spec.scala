package graft

import graft.operators.{Similarity, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** d55 structure-aware chunking: hand-computed boundary cuts, the
  * never-split-a-segment rule, and the overlap prefix.
  */
class ChunkStructuredSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  private def docs(rows: (Long, String)*): DataFrame = {
    val sp = spark
    import sp.implicits._
    rows.toDF("doc_id", "text")
  }

  private def rowsOf(df: DataFrame): Seq[(Long, Long, Long, Long, String)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getString(4))).sortBy(x => (x._1, x._2)).toSeq

  test("budget cut lands on the segment boundary, overlap prefixes next") {
    // segments: "aa bb"(2), "cc dd ee"(3), "ff"(1); offsets 0,2,5 at
    // budget 4 → chunks {0,1} and {2}; chunk 1 carries chunk 0's last
    // segment as context
    val got = rowsOf(TextOps.chunkStructured(
      docs(1L -> "aa bb. cc dd ee. ff"), budget = 4))
    assert(got == Seq(
      (1L, 0L, 2L, 5L, "aa bb cc dd ee"),
      (1L, 1L, 1L, 1L, "cc dd ee ff")))
  }

  test("a segment longer than the budget is never split") {
    val got = rowsOf(TextOps.chunkStructured(
      docs(1L -> "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"), budget = 4))
    assert(got == Seq((1L, 0L, 1L, 10L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10")))
  }

  test("overlap prefix survives the chunk-id gap an oversized segment makes") {
    // segments: "a b"(2), "c1..c10"(10), "z"(1) at offsets 0, 2, 12 and
    // budget 4 → chunk ids 0, 0, 3: the oversized segment jumps the id
    // from 0 straight to 3. The chunk AFTER the gap must still carry its
    // predecessor's last segment (lag by order, not an id−1 join).
    val got = rowsOf(TextOps.chunkStructured(
      docs(1L -> "a b. c1 c2 c3 c4 c5 c6 c7 c8 c9 c10. z"), budget = 4))
    assert(got == Seq(
      (1L, 0L, 2L, 12L, "a b c1 c2 c3 c4 c5 c6 c7 c8 c9 c10"),
      (1L, 3L, 1L, 1L, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10 z")))
  }

  test("exact-budget segment closes its chunk; empty docs drop") {
    val got = rowsOf(TextOps.chunkStructured(
      docs(1L -> "a b c d. e f", 2L -> "   "), budget = 4))
    assert(got == Seq(
      (1L, 0L, 1L, 4L, "a b c d"),
      (1L, 1L, 1L, 2L, "a b c d e f")))
  }

  test("all separator variants split; docs chunk independently") {
    val got = rowsOf(TextOps.chunkStructured(
      docs(1L -> "x y! z w? q r. s", 2L -> "u v"), budget = 2))
    // doc 1 segments: "x y"(0), "z w"(1), "q r"(2), "s"(3) at offsets
    // 0,2,4,6 → one chunk each; each later chunk overlaps its
    // predecessor's (single-segment) body
    assert(got == Seq(
      (1L, 0L, 1L, 2L, "x y"),
      (1L, 1L, 1L, 2L, "x y z w"),
      (1L, 2L, 1L, 2L, "z w q r"),
      (1L, 3L, 1L, 1L, "q r s"),
      (2L, 0L, 1L, 2L, "u v")))
  }
}

/** Generative soundness of the new graph operators: the Louvain gain
  * formula against the true modularity delta in EXACT integer space,
  * and coreness against an in-driver brute-force peel.
  */
class GraphGenerativeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  // deterministic pseudo-random simple graph on n vertices
  private def randomGraph(n: Int, m: Int, salt: String): Seq[(Long, Long)] = {
    def h(i: Int, tag: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$i:$tag:$salt".getBytes("UTF-8"))
      math.abs(BigInt(1, d.take(4)).toLong) % n
    }
    (0 until m).map(i => (h(i, "s"), h(i, "d")))
      .filter(p => p._1 != p._2)
      .map(p => (math.min(p._1, p._2), math.max(p._1, p._2)))
      .distinct
  }

  test("Louvain gain = exact modularity delta: 4m²·ΔQ == 2·gain for every move") {
    val sp = spark
    import sp.implicits._
    for (salt <- Seq("gA", "gB")) {
      val es = randomGraph(12, 30, salt)
      val edf = es.toDF("src", "dst")
      val adj = es.flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val deg = adj.view.mapValues(_.size.toLong).toMap
      val m = es.size.toLong
      // state after 2 gain rounds (a non-trivial, mid-trajectory state)
      val labels = graft.operators.Louvain.moveRounds(edf, 2)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      def suffStats(lab: Map[Long, Long]): (Long, Long) = {
        val intra = es.count(e => lab(e._1) == lab(e._2)).toLong
        val dc = lab.groupBy(_._2).view
          .mapValues(_.keys.toSeq.map(deg).sum).toMap
        (intra, dc.values.map(d => d * d).sum)
      }
      val (intra0, sds0) = suffStats(labels)
      val dcMap = labels.groupBy(_._2).view
        .mapValues(_.keys.toSeq.map(deg).sum).toMap
      var checked = 0
      for {
        v <- adj.keys.toSeq.sorted
        b <- adj(v).map(labels).toSeq.distinct.sorted
        a = labels(v) if b != a
      } {
        val kvb = adj(v).count(labels(_) == b).toLong
        val kva = adj(v).count(u => labels(u) == a).toLong
        val gain = 2L * m * (kvb - kva) -
          deg(v) * (dcMap(b) - dcMap(a) + deg(v))
        val moved = labels.updated(v, b)
        val (intra1, sds1) = suffStats(moved)
        // Q·4m² = 4m·intra − Σ D_c², all integers — so the move's true
        // modularity delta times 4m² must equal exactly 2·gain
        val lhs = (4L * m * intra1 - sds1) - (4L * m * intra0 - sds0)
        assert(lhs == 2L * gain,
          s"salt=$salt v=$v $a→$b: ΔQ·4m²=$lhs vs 2·gain=${2L * gain}")
        checked += 1
      }
      assert(checked > 20, s"degenerate fixture $salt: only $checked moves")
    }
  }

  test("coreness equals the brute-force min-degree peel on random graphs") {
    val sp = spark
    import sp.implicits._
    for (salt <- Seq("cA", "cB", "cC")) {
      val es = randomGraph(40, 90, salt)
      val got = graft.operators.GraphBuilder
        .corenessConverged(es.toDF("src", "dst"))._1
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // textbook peel: repeatedly remove the minimum-degree vertex;
      // coreness(v) = max over the peel of min-degree at removal time
      var adj = es.flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1))
        .groupBy(_._1).view
        .mapValues(x => collection.mutable.Set(x.map(_._2): _*)).toMap
        .map(identity)
      val core = collection.mutable.Map[Long, Long]()
      var k = 0L
      val alive = collection.mutable.Set(adj.keys.toSeq: _*)
      while (alive.nonEmpty) {
        val v = alive.minBy(x => (adj(x).size, x))
        k = math.max(k, adj(v).size.toLong)
        core(v) = k
        for (u <- adj(v)) adj(u) -= v
        alive -= v
      }
      assert(got == core.toMap, s"salt=$salt: $got vs $core")
    }
  }
}

/** g54 maximal matching by locally-dominant edges: validity,
  * maximality, the path-graph closed form, and converged ≡ fixed-k.
  */
class MatchingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import graft.operators.Matching

  private def edges(rows: Seq[(Long, Long)]): DataFrame = {
    val sp = spark
    import sp.implicits._
    rows.toDF("src", "dst")
  }

  test("single edge matches in one round") {
    val (m, rounds) = Matching.maximalMatching(edges(Seq(3L -> 7L)))
    assert(m.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((3L, 7L)))
    assert(rounds == 1)
  }

  test("triangle: exactly one edge matches (two would share a vertex)") {
    val (m, _) = Matching.maximalMatching(
      edges(Seq(0L -> 1L, 1L -> 2L, 0L -> 2L)))
    assert(m.count() == 1)
  }

  test("fixture: valid matching, maximal, converged equals fixed-round") {
    val e = graft.sources.SyntheticGraph.portable(spark, 300, 900, "g54")
    val (m, rounds) = Matching.maximalMatching(e)
    val pairs = m.collect().map(r => (r.getLong(0), r.getLong(1)))
    val verts = pairs.flatMap(p => Seq(p._1, p._2))
    assert(verts.distinct.length == verts.length, "a vertex matched twice")
    val mv = verts.toSet
    val ue = e.select(
      least(col("src"), col("dst")).as("u"),
      greatest(col("src"), col("dst")).as("v"))
      .filter(col("u") =!= col("v")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(ue.forall(p => mv(p._1) || mv(p._2)),
      "an edge with two unmatched endpoints survives — not maximal")
    val fixed = Matching.maximalMatchingRounds(e, rounds + 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fixed == pairs.toSet)
    // local-dominance guarantee: ≥ half the maximum cardinality, and a
    // maximum matching can never exceed ⌊|V|/2⌋
    assert(pairs.length * 2 >= ue.flatMap(p => Seq(p._1, p._2))
      .distinct.length / 2)
  }
}

/** d56 bloom ingest gate: no false negatives (structural), the measured
  * cost split, and replay-vs-fresh behavior on a hand corpus.
  */
class BloomIngestSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import graft.operators.Dedup

  private def docs(rows: (Long, String)*): DataFrame = {
    val sp = spark
    import sp.implicits._
    rows.toDF("doc_id", "text")
  }

  test("replays drop, fresh docs keep — exact anti-join semantics") {
    val history = docs(1L -> "seen one", 2L -> "seen two", 3L -> "seen three")
    val batch = docs(10L -> "seen two", 11L -> "brand new", 12L -> "seen one")
    val got = Dedup.bloomIngestGate(history, batch)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(11L))
  }

  test("every truly-seen doc is dropped whatever the fpp (no false negatives)") {
    val history = docs((1L to 50L).map(i => i -> s"doc number $i"): _*)
    // batch replays ALL history texts under new keys at an aggressive fpp
    val batch = docs((1L to 50L).map(i => (i + 1000L) -> s"doc number $i"): _*)
    val got = Dedup.bloomIngestGate(history, batch, fpp = 0.5)
    assert(got.count() == 0, "a bloom false negative is impossible")
  }

  test("split is measured: misses skip the join, hits verify exactly") {
    val dir = "/root/testdata/sf0.001"
    val all = spark.read.parquet(s"$dir/documents.parquet")
    val history = all.filter(col("doc_id") % 3 =!= 0)
    val batch = all.filter(col("doc_id") % 3 === 0)
      .select(col("doc_id"), col("text"))
    val (miss, verified, h) =
      Dedup.bloomIngestStages(history, batch, fpp = 0.03)
    try {
      val nMiss = miss.count()
      val nVerified = verified.count()
      val nBatch = batch.count()
      // no cross-half duplicates in this corpus: everything is new, and
      // the bloom must route the overwhelming majority down the
      // join-free path (fpp 3% → expect ~97% misses; assert ≥ 80%)
      assert(nMiss + nVerified == nBatch)
      assert(nMiss >= (nBatch * 0.8).toLong,
        s"bloom fpp pathological: $nMiss misses of $nBatch")
    } finally h.unpersist(false)
  }
}

/** g53 full core decomposition by iterated neighbor h-index: closed-form
  * hand graphs, the coreness ⇔ kCore duality, and converged ≡ fixed-k.
  */
class CorenessSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import graft.operators.GraphBuilder

  private def edges(rows: Seq[(Long, Long)]): DataFrame = {
    val sp = spark
    import sp.implicits._
    rows.toDF("src", "dst")
  }

  private def coreMap(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("K4: everyone coreness 3, degree init is already the fixpoint") {
    val k4 = edges(for { a <- 0L to 3L; b <- 0L to 3L if a < b }
      yield (a, b))
    val (c, rounds) = GraphBuilder.corenessConverged(k4)
    assert(rounds == 1, "first round must prove stability")
    assert(coreMap(c) == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
  }

  test("triangle + pendant: 2,2,2,1 — the pendant peels one level down") {
    val (c, _) = GraphBuilder.corenessConverged(
      edges(Seq(0L -> 1L, 1L -> 2L, 0L -> 2L, 2L -> 3L)))
    assert(coreMap(c) == Map(0L -> 2L, 1L -> 2L, 2L -> 2L, 3L -> 1L))
  }

  test("path graph: coreness 1 everywhere despite interior degree 2") {
    val (c, _) = GraphBuilder.corenessConverged(
      edges(Seq(0L -> 1L, 1L -> 2L, 2L -> 3L, 3L -> 4L)))
    assert(coreMap(c).values.toSet == Set(1L))
  }

  test("duality: {coreness >= k} equals the converged k-core, k = 1..3") {
    val e = graft.sources.SyntheticGraph.portable(spark, 300, 900, "g53")
    val (cn, rounds) = GraphBuilder.corenessConverged(e)
    val byCn = coreMap(cn)
    for (k <- 1 to 3) {
      val core = GraphBuilder.kCoreConverged(e, k)._1
        .select("id").collect().map(_.getLong(0)).toSet
      assert(byCn.filter(_._2 >= k).keySet == core, s"k=$k mismatch")
    }
    // converged ≡ fixed-k for any k ≥ the stop depth (oracle validity)
    assert(byCn == coreMap(GraphBuilder.corenessRounds(e, rounds + 2)))
    // coreness never exceeds degree
    val deg = GraphBuilder.degrees(e).collect()
      .map(r => r.getLong(0) -> (r.getLong(1) + r.getLong(2))).toMap
    assert(byCn.forall { case (id, c) => c <= deg(id) })
  }
}

/** st9's native session_window under TRUE STREAMING replay (the st6
  * sentinel-flush discipline): out-of-order micro-batches, a late
  * event that MERGES two open sessions, watermark flush — the
  * converged emitted sessions must equal the batch operator on the
  * same events. st9's registered row locks the batch path; this locks
  * the state-store session-merge path of the SAME native operator.
  */
class NativeSessionStreamSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  test("streaming session_window with disorder and merge equals batch") {
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val base = 1700000000000L
    def ts(sec: Long) = new java.sql.Timestamp(base + sec * 1000L)
    val ms = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val agg = ms.toDS().toDF("user_id", "ts", "value")
      .withWatermark("ts", "60 seconds")
      .groupBy(
        col("user_id"),
        org.apache.spark.sql.functions
          .session_window(col("ts"), "30 seconds").as("sw"))
      .agg(
        count("*").as("n_events"),
        round(sum(col("value")), 4).as("sum_value"))
      .select(
        col("user_id"), col("sw.start").as("start"),
        col("n_events"), col("sum_value"))
    val q = agg.writeStream.format("memory").queryName("st9stream")
      .outputMode("append").start()
    try {
      // batch 1: user 1 at 0s and 60s — two OPEN sessions (59 < 60,
      // touching-window rule keeps them apart); user 2 out of order
      ms.addData((1L, ts(0), 1.0), (1L, ts(60), 4.0), (2L, ts(45), 10.0),
        (2L, ts(40), 20.0))
      q.processAllAvailable()
      // batch 2: LATE event at 29s — its [29,59) window touches
      // [0,30), so user 1's two fragments MERGE into one session in
      // the state store (the semantics only the streaming path has)
      ms.addData((1L, ts(29), 2.0))
      q.processAllAvailable()
      assert(spark.table("st9stream").count() == 0,
        "nothing may emit before the watermark passes a session's end")
      // sentinel on an uncompared user pushes the watermark past every
      // horizon → all sessions of users 1 and 2 flush
      ms.addData((99L, ts(10000), 0.0))
      q.processAllAvailable()
      val sessNo = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("start"))
      val got = spark.table("st9stream")
        .filter(col("user_id") =!= 99L)
        .withColumn("session_no", row_number().over(sessNo).cast("long"))
        .select("user_id", "session_no", "n_events", "sum_value")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSet
      val batch = graft.streaming.EventStreams.sessionizeNative(
        Seq(
          (1L, ts(0), 1.0), (1L, ts(60), 4.0), (1L, ts(29), 2.0),
          (2L, ts(45), 10.0), (2L, ts(40), 20.0))
          .toDF("user_id", "ts", "value"),
        gap = "30 seconds")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(got == batch, s"streaming $got vs batch $batch")
      // the merge really happened: user 1 emitted sessions {0,29} + {60}
      assert(got.contains((1L, 1L, 2L, 3.0)) && got.contains((1L, 2L, 1L, 4.0)))
    } finally q.stop()
  }
}

/** q48 INTERSECT ALL / EXCEPT ALL: bag semantics against the
  * closed-form per-user copy counts (min(c,p) and max(0, c−p)).
  */
class SetOpsAllSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  test("copy counts equal the closed-form bag algebra on testdata") {
    val dir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("q48_set_ops_all")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val ev = graft.sources.Tables.events(spark, dir)
    val counts = ev
      .filter(col("event_type").isin("click", "purchase"))
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("c"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("p"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val wantInter = counts.collect {
      case (u, c, p) if math.min(c, p) > 0 =>
        ("inter_all", u) -> math.min(c, p)
    }.toMap
    val wantExcept = counts.collect {
      case (u, c, p) if c - p > 0 => ("except_all", u) -> (c - p)
    }.toMap
    assert(got == wantInter ++ wantExcept)
  }
}

/** e28 IVF rebalance: size-threshold split selection, bounded blast
  * radius (untouched dirs byte-stable), member conservation, the
  * homogeneous-list refusal, and probe-exactness after the rewrite.
  */
class IvfRebalanceSpec extends AnyFunSuite {
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

  private def withIndex[T](emb: DataFrame, nList: Int)(
      f: String => T): T = {
    val idx = Similarity.buildIvfIndex(emb, nList)
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_ivf_rebspec").toString
    try {
      Similarity.writeIvfIndex(idx, tmp)
      idx.release()
      f(tmp)
    } finally {
      import scala.jdk.CollectionConverters._
      val root = java.nio.file.Paths.get(tmp)
      java.nio.file.Files.walk(root).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  private def corpus: DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")

  test("splits exactly the oversized lists; untouched dirs byte-stable") {
    withIndex(corpus, 4) { tmp =>
      val before = lists(tmp).select("c_id", "vec_id").collect()
        .map(r => r.getLong(0) -> r.getLong(1))
      val sizes = before.groupBy(_._1).view.mapValues(_.length.toLong).toMap
      // threshold between min and max so SOME lists split and some don't
      val thr = (sizes.values.min + sizes.values.max) / 2
      val expected = sizes.filter(_._2 > thr).keys.toSeq.sorted
      assert(expected.nonEmpty && expected.size < sizes.size,
        s"fixture must mix oversized and small lists: $sizes thr=$thr")
      val dirsBefore = listDirState(tmp)
      val splits = Similarity.rebalanceIvfIndex(spark, tmp, maxListSize = thr)
      assert(splits.map(_._1).sorted == expected,
        s"split set ${splits} vs expected $expected")
      // new ids allocated past the old max, in oversized order
      val maxOld = sizes.keys.max
      assert(splits.map(_._2) == splits.indices.map(maxOld + 1 + _))
      val dirsAfter = listDirState(tmp)
      for ((d, files) <- dirsBefore
           if !expected.contains(d.stripPrefix("c_id=").toLong))
        assert(dirsAfter(d) == files, s"untouched dir $d was rewritten")
      // member conservation: every split list's two parts partition it
      val after = lists(tmp).select("c_id", "vec_id").collect()
        .map(r => r.getLong(0) -> r.getLong(1))
      assert(after.map(_._2).sorted.toSeq == before.map(_._2).sorted.toSeq,
        "vector set must be preserved exactly")
      val newIdOf = splits.toMap
      for (c <- expected) {
        val orig = before.filter(_._1 == c).map(_._2).toSet
        val p0 = after.filter(_._1 == c).map(_._2).toSet
        val p1 = after.filter(_._1 == newIdOf(c)).map(_._2).toSet
        assert(p0.nonEmpty && p1.nonEmpty, s"one-sided split of $c")
        assert((p0 ++ p1) == orig && (p0 & p1).isEmpty,
          s"list $c not partitioned: ${p0.size}+${p1.size} vs ${orig.size}")
      }
      // centroid table tracks the layout: same c_id set as the dirs
      val centIds = spark.read.parquet(s"$tmp/centroids")
        .select("c_id").collect().map(_.getLong(0)).toSet
      assert(centIds == after.map(_._1).toSet)
    }
  }

  test("no-op when nothing exceeds the threshold") {
    withIndex(corpus, 4) { tmp =>
      val maxSize = lists(tmp).groupBy(col("c_id")).count()
        .agg(max("count")).first().getLong(0)
      val dirsBefore = listDirState(tmp)
      assert(
        Similarity.rebalanceIvfIndex(spark, tmp, maxListSize = maxSize)
          .isEmpty)
      assert(listDirState(tmp) == dirsBefore, "no-op must touch nothing")
    }
  }

  test("homogeneous list is refused (no one-sided ghost split)") {
    val sp = spark
    import sp.implicits._
    // 40 identical vectors: every sub-assignment ties to sub 0, so the
    // operator must leave the list unsplit rather than write a split
    // whose sub-1 partition is empty (stale rows would survive next to
    // the rewrite under dynamic overwrite)
    val flat = (0L until 40L).map(i => (i, Seq(1.0, 0.0, 0.0)))
      .toDF("vec_id", "embedding")
    withIndex(flat, 2) { tmp =>
      val dirsBefore = listDirState(tmp)
      assert(
        Similarity.rebalanceIvfIndex(spark, tmp, maxListSize = 5L).isEmpty)
      assert(listDirState(tmp) == dirsBefore)
    }
  }

  test("probe at nProbe = nList after rebalance is exact") {
    withIndex(corpus, 8) { tmp =>
      val thr = math.max(1L, corpus.count() / 8)
      Similarity.rebalanceIvfIndex(spark, tmp, maxListSize = thr)
      val disk = Similarity.readIvfIndex(spark, tmp)
      val probes = Seq(10L, 20L, 30L)
      val got = Similarity
        .probeIvfPruned(disk, probes, k = 5, nProbe = disk.nList)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val want = Similarity.knnBatch(corpus, probes, k = 5)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == want, "rebalance must be invisible to a full probe")
    }
  }
}
