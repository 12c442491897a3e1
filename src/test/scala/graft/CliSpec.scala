package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end CLI contract: SNAP file in → reference-format artifacts out
  * with the known-good ranks for the fixture graph.
  */
class CliSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark // shared session; the CLI
  // builder getOrCreate()s into it rather than spawning a second one

  test("PipelineMain writes gate report, packed chunks, summary") {
    val out = java.nio.file.Files.createTempDirectory("pipeout").toString
    graft.cli.PipelineMain.main(
      Array("/root/testdata/sf0.001/documents.parquet", out))
    val gate = spark.read.parquet(s"$out/gate_report")
    assert(gate.count() == 500)
    assert(gate.columns.toSeq == Seq("doc_id", "keep", "reason"))
    val packed = spark.read.parquet(s"$out/packed")
    assert(packed.count() > 0)
    assert(packed.columns.contains("seq_id"))
    val summary = java.nio.file.Files.readString(
      java.nio.file.Paths.get(out, "summary.txt"))
    assert(summary.startsWith("docs=500 "), summary)
    // the packed output is the p1 plan's result: spot-check one invariant
    // (offsets within a shard are strictly increasing by n_tokens)
    import org.apache.spark.sql.functions._
    val bad = packed.withColumn(
      "nxt", lead(col("start_offset"), 1).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("source")).orderBy(col("chunk_uid"))))
      .filter(col("nxt").isNotNull &&
        col("nxt") =!= col("start_offset") + col("n_tokens"))
      .count()
    assert(bad == 0)
  }

  test("PageRankMain writes final scores, top-50, reports, trace") {
    val in = java.nio.file.Files.createTempFile("graph", ".txt")
    java.nio.file.Files.writeString(
      in,
      "# test graph\n0 1\n0 2\n1 2\n2 0\n2 1\n3 2\n3 2\n4 3\n")
    val out = java.nio.file.Files.createTempDirectory("prout").toString

    graft.cli.PageRankMain.main(
      Array(in.toString, out, "10", "0.85", "1e-6", "5"))

    val top = java.nio.file.Files
      .readAllLines(java.nio.file.Paths.get(out, "pagerank_top_50.txt"))
    // node 2 is the known winner on this fixture (verified analytically
    // and against the library run): 0.4147156648
    assert(top.get(0) == "2\t0.4147156648", top.get(0))
    assert(top.size == 5)

    val scoresDir = new java.io.File(s"$out/final_scores")
    assert(scoresDir.listFiles().count(_.getName.startsWith("part-")) == 1)

    val report = java.nio.file.Files.readString(
      java.nio.file.Paths.get(out, "performance_report.txt"))
    assert(report.contains("Setup:"))
    assert(report.contains("Superstep_1:"))
    assert(report.contains("Cleanup_And_Write:"))

    val csv = java.nio.file.Files.readString(
      java.nio.file.Paths.get(out, "_timings.csv"))
    assert(csv.startsWith("Phase,Duration_ms"))

    val trace = java.nio.file.Files.readString(
      java.nio.file.Paths.get(out, "iteration_trace.csv"))
    assert(trace.startsWith("iteration,dangling_sum,avg_diff,total_pr,millis"))
    // graph has no dangling nodes (4→3→2 cycle closure): dangling sum 0
    assert(trace.linesIterator.drop(1).next().startsWith("1,0.000000000000000"))

    val rcsv = java.nio.file.Files.readString(
      java.nio.file.Paths.get(out, "resource_metrics.csv"))
    assert(rcsv.startsWith("Metric,Value"))
    assert(rcsv.contains("Shuffle_Write_bytes,"))
  }

  test("ResourceListener accounts shuffle bytes of an aggregation") {
    val sp = spark
    import sp.implicits._
    val l = graft.metrics.ResourceMetrics.attach(spark.sparkContext)
    l.quiesce()
    val before = l.snapshot
    // force a real exchange: wide-ish agg over enough distinct keys
    (1L to 50000L).toDF("k")
      .groupBy(org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.col("k"),
        org.apache.spark.sql.functions.lit(1000L)))
      .count()
      .count()
    l.quiesce()
    val used = l.snapshot - before
    spark.sparkContext.removeSparkListener(l)
    assert(used.shuffleWriteBytes > 0, used.toString)
    assert(used.shuffleReadBytes > 0, used.toString)
    assert(used.executorRunMs >= 0)
  }

  test("giraph and state ingest formats produce the same ranks as snap") {
    def runFmt(content: String, fmt: String): List[String] = {
      val in = java.nio.file.Files.createTempFile("g", ".txt")
      java.nio.file.Files.writeString(in, content)
      val out = java.nio.file.Files.createTempDirectory("pr").toString
      graft.cli.PageRankMain.main(
        Array(in.toString, out, "5", "0.85", "1e-6", "5", fmt))
      java.nio.file.Files
        .readAllLines(java.nio.file.Paths.get(out, "pagerank_top_50.txt"))
        .toArray.map(_.toString).toList
    }
    // same 4-node graph in all three formats: 1→2, 2→1, 2→3
    val snap = runFmt("1 2\n2 1\n2 3\n", "snap")
    val giraph = runFmt("1 2\n2 1 3\n", "giraph")
    val state = runFmt(
      "1\t0.33|2\n2\t0.33|1,3\n3\t0.33|\n", "state")
    assert(snap == giraph)
    assert(snap == state)
  }

  test("resume=true re-enters the loop from the state file's ranks") {
    def run(content: String, fmt: String, resume: Boolean): (List[String], List[String]) = {
      val in = java.nio.file.Files.createTempFile("g", ".txt")
      java.nio.file.Files.writeString(in, content)
      val out = java.nio.file.Files.createTempDirectory("prw").toString
      // damping 0.5 so the 1↔2 oscillator mixes fast enough to genuinely
      // converge at tol within the iteration budget (at 0.85 it needs
      // ~80 rounds — convergence rate tracks damping × |λ2|)
      graft.cli.PageRankMain.main(
        Array(in.toString, out, "30", "0.5", "1e-6", "1", fmt,
          resume.toString))
      val top = java.nio.file.Files
        .readAllLines(java.nio.file.Paths.get(out, "pagerank_top_50.txt"))
        .toArray.map(_.toString).toList
      val trace = java.nio.file.Files
        .readAllLines(java.nio.file.Paths.get(out, "iteration_trace.csv"))
        .toArray.map(_.toString).toList
      (top, trace)
    }
    val graph = "1\t0.33|2\n2\t0.33|1,3\n3\t0.33|\n"
    val (coldTop, coldTrace) = run(graph, "state", resume = false)
    assert(coldTrace.length - 1 > 3,
      "fixture must need several cold iterations for the test to bite")
    // write the (converged) scores back as a state file and resume: the
    // loop must stop at the minIter floor with a delta orders below the
    // cold run's — the resumable-snapshot payoff
    val scores = coldTop.map { l =>
      val Array(id, r) = l.split("\t"); (id, r)
    }.toMap
    val warmState =
      s"1\t${scores("1")}|2\n2\t${scores("2")}|1,3\n3\t${scores("3")}|\n"
    val (warmTop, warmTrace) = run(warmState, "state", resume = true)
    assert(warmTrace.length < coldTrace.length,
      s"warm ${warmTrace.length - 1} iterations vs cold ${coldTrace.length - 1}")
    // the resumed run continues AT the fixpoint: values agree with the
    // cold run beyond the state file's own 10-decimal rounding
    val warmScores = warmTop.map { l =>
      val Array(id, r) = l.split("\t"); (id, r.toDouble)
    }.toMap
    scores.foreach { case (id, r) =>
      assert(math.abs(warmScores(id) - r.toDouble) <= 1e-5,
        s"vertex $id moved from $r to ${warmScores(id)} on resume")
    }
    // resume=true outside state format is rejected loudly — guarded in
    // main; not exercised here because main sys.exits (CliSpec contract
    // tests run in-JVM)
  }
}
