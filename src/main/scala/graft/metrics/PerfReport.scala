package graft.metrics

import graft.operators.IterationStat
import java.nio.file.{Files, Paths}
import scala.collection.mutable.ArrayBuffer

/** Phase-timing side channel — the Spark analogue of the reference's
  * PerformanceMonitor (PerformanceMonitor.java:38-135, report written at
  * PageRankDriver.java:266-271) and the Giraph master's `_timings.csv`
  * (PageRankMasterCompute.java:125-143, rows `Phase,Duration_ms`:
  * `Setup`, `Superstep_<i>`, `Cleanup_And_Write`).
  */
final class PerfReport {
  private val phases = ArrayBuffer.empty[(String, Long)]

  def time[T](phase: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    phases += phase -> (System.nanoTime() - t0) / 1000000
    r
  }

  def add(phase: String, millis: Long): Unit = phases += phase -> millis

  def addIterations(trace: Seq[IterationStat]): Unit =
    trace.foreach(st => add(s"Superstep_${st.iteration}", st.millis))

  /** `performance_report.txt` shape: one `phase: N ms` line per phase plus
    * a total (PerformanceMonitor.java:49-61).
    */
  def reportText: String = {
    val lines = phases.map { case (p, ms) => s"$p: $ms ms" }
    (lines :+ s"Total: ${phases.map(_._2).sum} ms").mkString("\n") + "\n"
  }

  /** `_timings.csv` shape (PageRankMasterCompute.java:125-143). */
  def timingsCsv: String =
    "Phase,Duration_ms\n" +
      phases.map { case (p, ms) => s"$p,$ms" }.mkString("\n") + "\n"

  def saveTo(dir: String): Unit = {
    Files.createDirectories(Paths.get(dir))
    Files.writeString(Paths.get(dir, "performance_report.txt"), reportText)
    Files.writeString(Paths.get(dir, "_timings.csv"), timingsCsv)
  }
}

/** Numeric per-iteration trace writer (the reference logs danglingSum to
  * 15 dp and avgDiff in scientific notation per iteration,
  * PageRankDriver.java:201-222).
  */
object IterationTrace {
  def toCsv(trace: Seq[IterationStat]): String =
    "iteration,dangling_sum,avg_diff,total_pr,millis\n" +
      trace
        .map(st =>
          f"${st.iteration},${st.danglingSum}%.15f,${st.avgDiff}%.12e," +
            f"${st.totalPR}%.15f,${st.millis}")
        .mkString("\n") + "\n"

  def save(trace: Seq[IterationStat], path: String): Unit = {
    Files.createDirectories(Paths.get(path).getParent)
    Files.writeString(Paths.get(path), toCsv(trace))
  }
}
