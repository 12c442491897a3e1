package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Product quantization (e14) and binary sign quantization (e15):
  * structural invariants, hand-computed packings, and recall floors for
  * the engine-defined (trained / funnel) paths whose exact configurations
  * are oracle-locked at the gate.
  */
class QuantizationSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"
  private def emb: DataFrame = spark.read.parquet(s"$dir/embeddings.parquet")
  private val probes = Seq(0L, 1L, 2L, 3L, 4L)

  private def exactSets: Map[Long, Set[Long]] =
    Similarity.knnBatch(emb, probes, k = 10).collect()
      .groupBy(_.getLong(0))
      .map { case (p, rs) => p -> rs.map(_.getLong(1)).toSet }

  private def gotSets(df: DataFrame): Map[Long, Set[Long]] =
    df.collect()
      .groupBy(_.getLong(0))
      .map { case (p, rs) => p -> rs.map(_.getLong(1)).toSet }

  private def meanRecall(got: Map[Long, Set[Long]]): Double = {
    val ex = exactSets
    probes.map(p => got(p).intersect(ex(p)).size.toDouble / ex(p).size)
      .sum / probes.size
  }

  test("pqCodes: 8 codes per vector, all in [0, 16)") {
    val codes = Similarity.pqCodes(emb, m = 8, k = 16).collect()
    val n = emb.count()
    assert(codes.length == n * 8)
    assert(codes.forall { r =>
      val c = r.getInt(2); c >= 0 && c < 16
    })
    val perVec = codes.groupBy(_.getLong(0))
    assert(perVec.forall(_._2.map(_.getLong(1)).toSet == (0L until 8L).toSet))
  }

  test("pq anchors encode to themselves (distance-0 argmin)") {
    // each md5-sampled anchor's subvector is at distance 0 from its own
    // codebook entry, so its code in every subspace is its own index j
    // (no two anchors coincide on this fixture)
    val anchors = Similarity.pqAnchors(emb, 16)
    assert(anchors.size == 16 && anchors.forall(_.length == 64))
    val anchorIds = emb
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(16).select("vec_id").collect().map(_.getLong(0))
    val codes = Similarity.pqEncode(emb, m = 8, k = 16)
      .filter(col("vec_id").isin(anchorIds: _*))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    anchorIds.zipWithIndex.foreach { case (id, j) =>
      assert(codes(id).forall(_ == j), s"anchor $id (j=$j) → ${codes(id)}")
    }
  }

  test("pq ADC rerank dominates pure ADC; trained ≥ sampled recall") {
    // measured on this fixture: sampled pure-ADC 0.10, trained pure-ADC
    // 0.24, trained+rerank50 0.58 — honest numbers for 4-byte codes
    // (64× compression); the asserts pin the ORDERING (rerank can only
    // help, training can only help) plus a floor under the funnel
    val pureSampled = meanRecall(gotSets(
      Similarity.pqAdcKnn(emb, probes, topK = 10, m = 8, k = 16)))
    val rerankSampled = meanRecall(gotSets(
      Similarity.pqAdcReranked(
        emb, probes, topK = 10, candR = 50, m = 8, k = 16, trainIters = 0)))
    val rerankTrained = meanRecall(gotSets(
      Similarity.pqAdcReranked(
        emb, probes, topK = 10, candR = 50, m = 8, k = 16, trainIters = 3)))
    assert(rerankSampled >= pureSampled,
      s"rerank $rerankSampled < pure $pureSampled")
    assert(rerankTrained >= rerankSampled,
      s"trained $rerankTrained < sampled $rerankSampled")
    assert(rerankTrained >= 0.5, s"trained+rerank recall=$rerankTrained")
  }

  test("pqAdcReranked with shortlist = corpus equals exact kNN") {
    // candR ≥ |corpus| makes the candidate stage a no-op filter, so the
    // rerank IS the exact scan — the funnel's correctness anchor
    val n = emb.count().toInt
    val full = Similarity.pqAdcReranked(
      emb, probes, topK = 10, candR = n, m = 8, k = 16, trainIters = 0)
      .select("probe_id", "vec_id", "cos_sim").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exact = Similarity.knnBatch(emb, probes, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(full == exact)
  }

  test("IVF-PQ: pruning reaches PartitionFilters, lists beat SQ on disk") {
    val e = emb
    val idx = Similarity.buildIvfIndex(e, nList = 16)
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_ivfpq_spec").toString
    val tmpSq = java.nio.file.Files
      .createTempDirectory("graft_ivfsq_spec2").toString
    try {
      Similarity.writeIvfPqIndex(idx, tmp, m = 8, k = 16)
      Similarity.writeIvfSqIndex(idx, tmpSq)
      idx.release()
      // nProbe = nList reproduces the pure ADC ranking exactly
      val full = Similarity.probeIvfPqPruned(e, tmp, probes, k = 10, nProbe = 16)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val adc = Similarity.pqAdcKnn(e, probes, topK = 10, m = 8, k = 16)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(full == adc, "nProbe=nList must equal the pure ADC ranking")
      // pruned probe: the c_id IN literal must reach PartitionFilters
      val pruned = Similarity.probeIvfPqPruned(e, tmp, probes, k = 10, nProbe = 4)
      val plan = pruned.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters: ["), plan)
      assert(
        "PartitionFilters: \\[[^\\]]*c_id".r.findFirstIn(plan).isDefined, plan)
      // pruning to 4/16 lists keeps most of the full-ADC top-10
      val prunedSets = gotSets(pruned)
      val adcSets = adc.groupBy(_._1).map { case (p, rs) => p -> rs.map(_._2) }
      val keep = probes
        .map(p => prunedSets(p).intersect(adcSets(p)).size.toDouble / 10)
        .sum / probes.size
      assert(keep >= 0.5, s"pruned keeps only $keep of full ADC")
      // the economics: PQ lists (8 small ints/vector) must be smaller on
      // disk than SQ lists (64 ints/vector) for the same index
      import scala.jdk.CollectionConverters._
      def bytes(p: String): Long = java.nio.file.Files
        .walk(java.nio.file.Paths.get(p)).iterator().asScala
        .filter(_.toString.endsWith(".parquet"))
        .map(java.nio.file.Files.size(_)).sum
      val pq = bytes(s"$tmp/lists"); val sq = bytes(s"$tmpSq/lists")
      assert(pq < sq, s"PQ lists $pq bytes not smaller than SQ $sq")
    } finally {
      import scala.jdk.CollectionConverters._
      Seq(tmp, tmpSq).foreach { p =>
        java.nio.file.Files.walk(java.nio.file.Paths.get(p))
          .iterator().asScala.toSeq.reverse
          .foreach(f => java.nio.file.Files.deleteIfExists(f))
      }
    }
  }

  test("signPack: hand-computed packing on literal vectors") {
    import spark.implicits._
    // dims 0 and 33 positive → lo = 1, hi = 2; all-negative → (0, 0);
    // zeros do NOT set bits (strict x > 0)
    val v1 = Array.fill(64)(-1.0f)
    v1(0) = 2.5f; v1(33) = 0.1f
    val v2 = Array.fill(64)(-0.5f)
    val v3 = Array.fill(64)(0.0f)
    val df = Seq((1L, v1.toSeq), (2L, v2.toSeq), (3L, v3.toSeq))
      .toDF("vec_id", "embedding")
    val got = Similarity.signPack(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(1L) == ((1L, 2L)))
    assert(got(2L) == ((0L, 0L)))
    assert(got(3L) == ((0L, 0L)))
  }

  test("sign funnel: hamming 0 to an identical vector; recall floor") {
    import spark.implicits._
    // duplicate vector pair → hamming 0 candidate ranked first
    val base = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") === 0L).collect()(0).getSeq[Float](1)
    val dup = Seq((9000L, base)).toDF("vec_id", "embedding")
    val withDup = emb.select(col("vec_id"), col("embedding"))
      .unionByName(dup)
    val top = Similarity.knnBinaryFunnel(
      withDup, Seq(0L), topK = 1, candR = 10).collect()(0)
    assert(top.getLong(1) == 9000L && top.getLong(2) == 0L,
      s"dup not first: ${top.mkString(",")}")
    // measured mean recall on this fixture: 0.68 (8-byte codes)
    val rec = meanRecall(gotSets(
      Similarity.knnBinaryFunnel(emb, probes, topK = 10, candR = 50)))
    assert(rec >= 0.55, s"sign-funnel recall=$rec")
  }

  test("sign funnel with candR = corpus equals exact kNN") {
    val n = emb.count().toInt
    val full = Similarity.knnBinaryFunnel(emb, probes, topK = 10, candR = n)
      .select("probe_id", "vec_id", "cos_sim").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exact = Similarity.knnBatch(emb, probes, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(full == exact)
  }
}
