package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.EdgeListReader

/** Round-17 plan evidence: for every loop/lifecycle operator the round
  * wrapped in [[PlanScope]], dump the representative per-round frame's
  * `explain("formatted")` twice — planned at the session width
  * (`plans/r17/<query>_before.txt`) and inside the operator's own
  * narrowing scope (`..._after.txt`) — on the SAME fixture the bench
  * query runs. The diff the files exist to witness is the Exchange
  * partitioning count: `hashpartitioning(..., 32)` at session width vs
  * the estimate-derived narrow target (1–4 on fixture-sized graphs;
  * unchanged at scale, where narrowFor is the identity).
  *
  * Measurement-only tooling: never called from any query path.
  */
object PlanDumpR17 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outDir = if (args.nonEmpty) args(0) else "plans/r17"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()

    def fmt(df: DataFrame): String =
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    def write(path: String, text: String): Unit =
      java.nio.file.Files.write(
        java.nio.file.Paths.get(path), text.getBytes("UTF-8"))
    /** One before/after pair: `mk` re-planned outside and inside the
      * narrow scope keyed on `sizer` (the frame the operator sizes by).
      */
    def dump(name: String, sizer: DataFrame)(mk: => DataFrame): Unit = {
      val target =
        PlanScope.narrowTarget(spark, PlanScope.estimateRows(sizer))
      write(s"$outDir/${name}_before.txt",
        s"// $name — per-round frame at session width (" +
          s"spark.sql.shuffle.partitions=$cpus)\n" + fmt(mk))
      PlanScope.narrowFor(sizer) {
        write(s"$outDir/${name}_after.txt",
          s"// $name — same frame inside PlanScope.narrowFor " +
            s"(estimate-derived target=$target; at 100 TB the estimate " +
            "keeps the session width)\n" + fmt(mk))
      }
      println(s"[plandump] $name target=$target")
    }

    // g24/g24b HITS: the authority gather (one of the two per-round
    // exchanges) on the orders co-occurrence graph
    {
      val e = EdgeListReader.fromOrdersCached(spark, sfDir)
        .select(col("src"), col("dst")).dropDuplicates()
      dump("g24b_hits_round", e) {
        val eSrc = e.repartition(col("src"))
        val h0 = GraphBuilder.vertices(e)
          .select(col("id"), lit(1.0).as("h"))
        Hits.authGather(eSrc, h0)
      }
    }
    // g23/g23b SSSP: one Bellman–Ford relaxation round on the
    // symmetrized weighted graph
    {
      val w = EdgeListReader.fromOrdersWeighted(spark, sfDir)
      val sym = w.union(
        w.select(col("dst").as("src"), col("src").as("dst"), col("w")))
      dump("g23b_sssp_round", sym) {
        val e = sym.select(
          col("src").as("id"), col("dst"), col("w").cast("double").as("w"))
          .repartition(col("id"))
        val dist0 = sym.agg(min(col("src")).as("id"))
          .select(col("id"), lit(0.0).as("dist"))
        dist0.union(
          dist0.join(e, Seq("id"))
            .select(col("dst").as("id"), (col("dist") + col("w")).as("dist")))
          .groupBy(col("id")).agg(min(col("dist")).as("dist"))
      }
    }
    // g30 ANF: one HyperBall sketch-diffusion round on the g30 fixture
    {
      val edges = graft.sources.SyntheticGraph.portable(spark, 300, 1500, "g30")
      dump("g30_anf_round", edges) {
        val e = edges.select(col("src"), col("dst")).repartition(col("dst"))
        val state0 = GraphBuilder.vertices(edges)
          .groupBy(col("id"))
          .agg(hll_sketch_agg(col("id"), lit(12)).as("sk"))
        Anf.sketchRound(e, state0)
      }
    }
    // g25/g25b k-core: one peel round (adjacency + internal-degree
    // stage), built whole inside each planning scope like the operator
    // does
    {
      val edges = graft.sources.SyntheticGraph.portable(spark, 400, 1200, "g25")
      val cleanup = scala.collection.mutable.ListBuffer[DataFrame]()
      dump("g25_kcore_round", edges) {
        val (ue, und) = GraphBuilder.kCoreAdjacency(edges)
        cleanup += ue; cleanup += und
        GraphBuilder.kCoreInternalDeg(und, GraphBuilder.vertices(edges))
      }
      cleanup.foreach(_.unpersist(false))
    }
    // g27 weighted s-core: one strength round, adjacency inside the
    // scope (the operator's own shape)
    {
      val edges = EdgeListReader.fromOrdersWeighted(spark, sfDir)
      val cleanup = scala.collection.mutable.ListBuffer[DataFrame]()
      dump("g27_wcore_round", edges) {
        val und = GraphBuilder.kCoreWeightedAdjacency(edges)
        cleanup += und
        val s0 = edges.select(col("src").as("id"))
          .union(edges.select(col("dst").as("id"))).distinct()
        GraphBuilder.kCoreStrength(und, s0)
      }
      cleanup.foreach(_.unpersist(false))
    }
    // g32 k-truss: one edge-support round on the g32 fixture
    {
      val edges = graft.sources.SyntheticGraph.portable(spark, 200, 1600, "g32")
      dump("g32_ktruss_round", edges)(
        GraphBuilder.edgeSupport(GraphBuilder.undirectedSimple(edges)))
    }
    // g54 maximal matching: one local-dominance round
    {
      val edges = graft.sources.SyntheticGraph.portable(spark, 300, 900, "g54")
      dump("g54_matching_round", edges) {
        val e0 = GraphBuilder.undirectedSimple(edges)
          .select(col("u"), col("v"),
            md5(concat_ws(":", col("u"), col("v"))).as("rk"))
        Matching.matchingRound(e0, 1)._1
      }
    }
    // g36 walks: one deterministic walk step
    {
      val edges = graft.sources.SyntheticGraph.portable(spark, 300, 900, "g36")
      dump("g36_walks_step", edges) {
        val adj = edges.select(col("src"), col("dst")).distinct()
          .groupBy(col("src"))
          .agg(array_sort(collect_list(col("dst"))).as("nbrs"))
          .repartition(col("src"))
        val live0 = GraphBuilder.vertices(edges).select(
          col("id").as("walk_id"), col("id").as("cur"),
          array(col("id")).as("path"))
        Walks.walkStep(adj, live0, 1, "g36")
      }
    }
    // e7/e21/e13/e27/e28/e12/e16/p11/p15: the IVF probe (the lifecycle
    // family's shared read path) on the embeddings corpus
    {
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val idx = Similarity.buildIvfIndex(emb, nList = 16)
      dump("e7_ivf_probe", emb)(
        Similarity.probeIvfPruned(
          idx, Seq(0L, 1L, 2L, 3L, 4L), k = 10, nProbe = 16))
      idx.release()
    }
    spark.stop()
  }
}
