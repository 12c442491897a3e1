package graft.cli

import graft.core.GraftSession
import graft.metrics.{IterationTrace, PerfReport}
import graft.operators.{PageRank, PageRankConfig}
import graft.sources.EdgeListReader
import org.apache.spark.sql.functions._

/** CLI mirroring the reference driver contract (O24,
  * PageRankDriver.java:58-71):
  *
  * {{{
  *   PageRankMain <input> <output> [maxIter=10] [damping=0.85]
  *                [threshold=1e-6] [minIter=5] [format=snap]
  * }}}
  *
  * `format` accepts `snap` (raw edge list, the MapReduce module's input),
  * `giraph` (adjacency text `id nbr nbr...`, the Giraph module's input —
  * run_pagerank.sh:6 feeds a pre-cleaned file), or `state` (the packed
  * `id\tPR|links` iteration-state rows) — so every ingest path a user of
  * the reference has keeps working.
  *
  * `resume=true` (8th arg, `state` format only) RESUMES the computation
  * from the state file's ranks instead of restarting at 1/N — the warm-
  * start path the reference's iteration-dir model implies
  * (PageRankDriver.java:121-122,177-185: every iteration dir is a
  * resumable snapshot) but its driver never exposes. Default `false`
  * keeps the historical contract: state-format ingest reproduces the
  * snap-format ranks exactly (CliSpec-pinned).
  *
  * and its output contract (O17-O22, PageRankDriver.java:250-271):
  *   - `<output>/final_scores/` — merged single-file `id \t rank` text
  *   - `<output>/pagerank_top_50.txt` — top-K=50, `id \t rank` desc
  *   - `<output>/performance_report.txt` + `_timings.csv` + trace CSV
  *
  * The reference runs merge/top-K single-threaded in the client JVM over
  * HDFS streams (SURVEY.md §3 "scalability bug"); here both stay
  * distributed until the final coalesce/limit.
  */
object PageRankMain {

  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println(
        "usage: PageRankMain <input> <output> [maxIter] [damping] " +
          "[threshold] [minIter] [format=snap|giraph|state] " +
          "[resume=false]")
      sys.exit(2)
    }
    val input = args(0)
    val output = args(1)
    val cfg = PageRankConfig(
      maxIter = if (args.length > 2) args(2).toInt else 10,
      damping = if (args.length > 3) args(3).toDouble else 0.85,
      tol = if (args.length > 4) args(4).toDouble else 1e-6,
      minIter = if (args.length > 5) args(5).toInt else 5)

    // reuse a live session if the caller has one (embedding/tests);
    // only a session created here is stopped here
    val existing = org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
    val spark = existing.getOrElse(GraftSession.local("graft-pagerank"))
    val perf = new PerfReport
    // shuffle/spill/input accounting for the whole run — the numeric
    // core of the reference's per-node monitoring CSVs (O22)
    val resources = graft.metrics.ResourceMetrics.attach(spark.sparkContext)
    try {
      val format = if (args.length > 6) args(6) else "snap"
      val resume = args.length > 7 && args(7).toBoolean
      if (resume && format != "state") {
        System.err.println("resume=true requires format=state " +
          "(the ranks to resume from live in the state rows)")
        sys.exit(2)
      }
      val (edges, explicitVerts, warmRanks) = perf.time("Setup") {
        val (e, v, w) = format match {
          case "snap" => (EdgeListReader.snap(spark, input), None, None)
          case "giraph" =>
            // adjacency lines enumerate vertices; keep neighbor-less ones
            (EdgeListReader.giraphAdjacency(spark, input),
              Some(EdgeListReader.giraphVertices(spark, input)), None)
          case "state" =>
            // state rows enumerate every vertex (including isolated ones
            // an edge list cannot express) — pass them through explicitly;
            // with resume=true their RANKS seed the loop too (the
            // iteration-dir-as-resumable-snapshot model made real)
            val st = graft.sources.IterationStateIO.read(spark, input)
            val e = st.select(
              org.apache.spark.sql.functions.col("id").as("src"),
              org.apache.spark.sql.functions
                .explode(org.apache.spark.sql.functions.col("outlinks"))
                .as("dst"))
            (e, Some(st.select("id")),
              if (resume) Some(st.select("id", "rank")) else None)
          case other =>
            System.err.println(s"unknown format: $other (snap|giraph|state)")
            sys.exit(2)
        }
        val cached = e.cache()
        cached.count()
        (cached, v, w)
      }
      val res =
        PageRank.run(spark, edges, cfg, explicitVerts, initRanks = warmRanks)
      perf.addIterations(res.trace)

      perf.time("Cleanup_And_Write") {
        val scores = res.ranks.select(
          concat(
            col("id").cast("string"),
            lit("\t"),
            format_string("%.10f", col("rank"))).as("value"))
        scores.coalesce(1).write.mode("overwrite")
          .text(s"$output/final_scores")

        val top = PageRank.topK(res.ranks, 50).collect()
        val topText = top
          .map(r => s"${r.getLong(0)}\t${"%.10f".format(r.getDouble(1))}")
          .mkString("", "\n", "\n")
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(output))
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(output, "pagerank_top_50.txt"), topText)
      }

      IterationTrace.save(res.trace, s"$output/iteration_trace.csv")
      perf.saveTo(output)
      resources.quiesce()
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(output, "resource_metrics.csv"),
        resources.snapshot.toCsv)
      println(
        s"PageRank finished: ${res.iterations} iterations, " +
          f"final avgDiff=${res.trace.lastOption.map(_.avgDiff).getOrElse(0.0)}%.3e, " +
          f"total PR=${res.trace.lastOption.map(_.totalPR).getOrElse(0.0)}%.6f")
    } finally {
      if (existing.isEmpty) spark.stop()
    }
  }
}
