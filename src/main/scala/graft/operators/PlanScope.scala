package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scoped, refcounted NARROWING of `spark.sql.shuffle.partitions` for
  * tiny-graph iterative loops — the r16 verdict's 108 s Louvain budget,
  * measured to the root cause: on a 200-vertex fixture every gain round
  * plans ~6 exchanges at the session's 32 reducers, so each of the
  * ladder's ~100 rounds schedules hundreds of sub-millisecond tasks —
  * scheduling, not data (53.5 s → 31.0 s for the same converged ladder
  * by narrowing to ≤4 partitions; values bit-identical, the decision
  * algebra is partition-count independent). At real scale the guard
  * never fires: narrowing applies only when the ESTIMATED edge count is
  * small enough that the per-reducer row target (~8k) undercuts the
  * session width — a 100 TB graph keeps its full parallelism, and the
  * estimate comes free from Catalyst statistics (no input pass).
  *
  * Same discipline as [[PageRank]]'s refcounted AQE suppression, keyed
  * PER SESSION: the first entering loop saves the session value and
  * narrows, nested loops refcount, the last exit restores. While a
  * tiny-graph loop runs, OTHER queries on the same session also plan at
  * the narrowed width — a local-mode latency trade on concurrent
  * sessions-sharing tests, never a correctness issue (stated, the AQE
  * scope's exact caveat).
  */
private[graft] object PlanScope {

  private val key = "spark.sql.shuffle.partitions"
  private val lock = new Object
  private val state =
    scala.collection.mutable.Map.empty[SparkSession, (Int, Option[String], Boolean)]

  /** Catalyst row-count estimate of `df` (leaf-sum bounded, the
    * [[PageRank.estimateEdgeParts]] argument: join-derived plans carry
    * multiplicative top-level estimates, but a row must be scanned
    * before it can be joined, so Σ leaves bounds the working set).
    */
  private[graft] def estimateRows(df: DataFrame): Long = {
    val plan = df.queryExecution.optimizedPlan
    val stats = plan.stats
    stats.rowCount
      .getOrElse {
        val top = stats.sizeInBytes / 12
        val leaves = plan.collectLeaves()
          .map(l => l.stats.rowCount.getOrElse(l.stats.sizeInBytes / 12))
          .sum
        top.min(leaves)
      }
      .min(BigInt(Long.MaxValue)).toLong
  }

  /** The narrowed width for an iterative loop over ~`estRows`-row
    * frames: ~8k rows per reducer (below that a task costs more to
    * schedule than to run), never below 1, never ABOVE the session
    * width (this scope only narrows).
    */
  private[graft] def narrowTarget(spark: SparkSession, estRows: Long): Int =
    math.max(1L, math.min(
      estRows / 8192L + 1L,
      spark.sessionState.conf.numShufflePartitions.toLong)).toInt

  /** Run `body` with the session's shuffle width narrowed to `target`
    * (no-op when `target` ≥ the current width). Re-entrant per session;
    * exceptions restore on every path.
    */
  def narrowShufflePartitions[T](
      spark: SparkSession, target: Int)(body: => T): T = {
    lock.synchronized {
      state.get(spark) match {
        case Some((depth, saved, changed)) =>
          state(spark) = (depth + 1, saved, changed)
        case None =>
          val cur = spark.sessionState.conf.numShufflePartitions
          if (target < cur) {
            state(spark) = (1, spark.conf.getOption(key), true)
            spark.conf.set(key, target.toString)
          } else state(spark) = (1, None, false)
      }
    }
    try body
    finally lock.synchronized {
      state.get(spark) match {
        case Some((1, saved, changed)) =>
          state.remove(spark)
          if (changed) saved match {
            case Some(v) => spark.conf.set(key, v)
            case None    => spark.conf.unset(key)
          }
        case Some((depth, saved, changed)) =>
          state(spark) = (depth - 1, saved, changed)
        case None => () // unbalanced exit: nothing saved, nothing to do
      }
    }
  }

  /** [[narrowShufflePartitions]] sized from `frame`'s own Catalyst
    * estimate — the one-liner loop entry points use.
    */
  def narrowFor[T](frame: DataFrame)(body: => T): T = {
    val spark = frame.sparkSession
    narrowShufflePartitions(
      spark, narrowTarget(spark, estimateRows(frame)))(body)
  }

  /** [[narrowShufflePartitions]] sized from an EXACT row count the
    * caller already holds (e.g. a replayed stream's collected event
    * array) — same ~8k rows/reducer target, same only-narrows contract.
    * The streaming fixtures use this around the drive-the-stream block:
    * each stateful operator otherwise commits one state-store instance
    * PER shuffle partition PER micro-batch, a fixed cost that dwarfs
    * fixture-sized state; at scale the row count keeps the session
    * width.
    */
  def narrowForRows[T](spark: SparkSession, nRows: Long)(body: => T): T =
    narrowShufflePartitions(spark, narrowTarget(spark, nRows))(body)
}
