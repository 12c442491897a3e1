package graft.operators

import org.apache.spark.graphx._
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** BSP-faithful PageRank twin on GraphX — mirrors the reference's Giraph
  * module (PageRankVertex.java + PageRankMasterCompute.java) the way the
  * DataFrame implementation mirrors the MapReduce module. Used for
  * differential testing (the reference's own MR-vs-Giraph duality,
  * SURVEY.md §5.2.5).
  *
  * Deliberately NOT `graphx.lib.PageRank`: its dangling handling and
  * convergence semantics differ from the reference's NetworkX-aligned ones
  * (SURVEY.md §7), so the vertex program is written out.
  *
  * `aggregateMessages` with a merge function gives map-side message
  * combining — the combiner the reference's Giraph config never registers
  * (SURVEY.md §4.1 "missing combiner").
  */
object GraphXPageRank {

  def run(
      spark: SparkSession,
      edgesDf: DataFrame,
      cfg: PageRankConfig = PageRankConfig()): PageRankResult = {

    val d = cfg.damping

    // edge-SET semantics, as in the reference's LongNullHashSetEdges
    // (Giraph PageRankDriver.java:81-82)
    val edgeRdd: RDD[Edge[Unit]] = edgesDf
      .select("src", "dst")
      .distinct()
      .rdd
      .map(r => Edge(r.getLong(0), r.getLong(1), ()))

    val base = Graph.fromEdges(
      edgeRdd, 0.0,
      StorageLevel.MEMORY_AND_DISK, StorageLevel.MEMORY_AND_DISK)
    val n = base.numVertices
    require(n > 0, "empty graph")

    // vertex attr = (outdeg, rank); superstep-0 init 1/N
    // (PageRankVertex.java:21-27)
    var g: Graph[(Int, Double), Unit] = base
      .outerJoinVertices(base.outDegrees) { (_, _, degOpt) =>
        (degOpt.getOrElse(0), 1.0 / n)
      }
      .persist(StorageLevel.MEMORY_AND_DISK)

    var danglingSum = g.vertices
      .map { case (_, (deg, r)) => if (deg == 0) r else 0.0 }
      .sum()

    val trace = scala.collection.mutable.ArrayBuffer.empty[IterationStat]
    var iter = 0
    var converged = false

    // same opt-in per-superstep resource trace as the DataFrame loop
    val resListener =
      if (cfg.traceResources)
        Some(graft.metrics.ResourceMetrics.attach(spark.sparkContext))
      else None
    def resSnap(): Option[graft.metrics.ResourceSnapshot] =
      resListener.map { l => l.quiesce(); l.snapshot }

    try {
    while (iter < cfg.maxIter && !converged) {
      val snap0 = resSnap()
      val t0 = System.nanoTime()

      // sendMessageToAllEdges(v, PR/outdeg) + merge-sum
      // (PageRankVertex.java:56-58)
      val msgs: VertexRDD[Double] = g.aggregateMessages[Double](
        ctx => ctx.sendToDst(ctx.srcAttr._2 / ctx.srcAttr._1),
        _ + _)

      val prevG = g
      // formula with lagged dangling mass (PageRankVertex.java:35-43)
      val withPrev: Graph[(Int, Double, Double), Unit] =
        g.outerJoinVertices(msgs) { case (_, (deg, prev), msgOpt) =>
          val rank = (1.0 - d) / n + d * danglingSum / n +
            d * msgOpt.getOrElse(0.0)
          (deg, rank, prev)
        }
      withPrev.persist(StorageLevel.MEMORY_AND_DISK)

      // single pass over vertices for Σ|Δ|, Σ PR, next dangling mass
      // (the Giraph module's three registered DoubleSumAggregators,
      // PageRankMasterCompute.java:34-43)
      val (l1, totalPR, dang) = withPrev.vertices
        .map { case (_, (deg, nr, pr)) =>
          (math.abs(nr - pr), nr, if (deg == 0) nr else 0.0)
        }
        .fold((0.0, 0.0, 0.0)) { (a, b) =>
          (a._1 + b._1, a._2 + b._2, a._3 + b._3)
        }

      g = withPrev.mapVertices { case (_, (deg, nr, _)) => (deg, nr) }
      g.persist(StorageLevel.MEMORY_AND_DISK)
      g.vertices.count()
      prevG.unpersist(false)
      withPrev.unpersist(false)

      danglingSum = dang
      val avgDiff = l1 / n
      iter += 1
      val iterMs = (System.nanoTime() - t0) / 1000000
      val delta = (resSnap(), snap0) match {
        case (Some(a), Some(b)) => Some(a - b)
        case _                  => None
      }
      trace += IterationStat(
        iter, danglingSum, avgDiff, totalPR, iterMs,
        executorRunMs = delta.map(_.executorRunMs).getOrElse(0L),
        executorCpuMs = delta.map(_.executorCpuMs).getOrElse(0L),
        shuffleReadMB = delta
          .map(d => math.round(d.shuffleReadBytes / 1048576.0 * 10) / 10.0)
          .getOrElse(0.0),
        shuffleWriteMB = delta
          .map(d => math.round(d.shuffleWriteBytes / 1048576.0 * 10) / 10.0)
          .getOrElse(0.0))

      if (avgDiff <= cfg.tol && iter >= cfg.minIter) converged = true
    }
    } finally {
      resListener.foreach(spark.sparkContext.removeSparkListener)
    }

    val ranksDf = {
      val sp = spark
      import sp.implicits._
      g.vertices.map { case (id, (_, r)) => (id, r) }.toDF("id", "rank")
    }
    // the returned frame derives from g.vertices ONLY — release the
    // columnar edge partitions (the dominant footprint: ~|E| longs) and
    // the init-graph's vertex cache now instead of leaking them for the
    // session's lifetime (a bench running many graph queries in one JVM
    // OOMed on exactly this accumulation)
    g.edges.unpersist(false)
    base.vertices.unpersist(false)
    PageRankResult(ranksDf, iter, trace.toSeq)
  }
}
