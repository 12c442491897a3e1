package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical._

/** Row-level parallelism guard for compute-heavy narrow stages.
  *
  * A Parquet scan parallelizes at file/row-group granularity, so a small
  * fixture (one file, one row group) hands ALL of a stage's work to one
  * task — tokenize/shingle/hash projections and the stream side of a
  * broadcast join then run single-core no matter how many executor
  * threads exist. At production scale a scan has thousands of splits and
  * this guard is a NO-OP; on an unsplittable tiny input it spends one
  * cheap exchange to restore parallelism for the expensive stage that
  * follows.
  */
object Parallelism {

  /** Operators whose presence means the frame already went (or will go)
    * through a shuffle — its parallelism is set by
    * `spark.sql.shuffle.partitions`/AQE, not by scan splits, so the guard
    * has nothing to fix. Just as important: probing such a frame's
    * partition count via `df.rdd` would be an EXECUTION, not an
    * inspection — under AQE, `AdaptiveSparkPlanExec.execute()`
    * materializes every upstream shuffle stage, eagerly running the whole
    * pipeline once before the real query runs it again. So wide frames
    * are returned untouched without ever compiling their physical plan.
    */
  private def isWide(plan: LogicalPlan): Boolean = plan.exists {
    case _: Join | _: Aggregate | _: Window | _: Sort | _: Distinct |
        _: Deduplicate | _: RepartitionOperation | _: GlobalLimit =>
      true
    case _ => false
  }

  def ensure(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (isWide(df.queryExecution.optimizedPlan)) df
    // narrow scan-shaped plan: df.rdd compiles it but runs no job (there
    // are no shuffle stages for AQE to materialize), so the partition
    // count read below is a plan inspection, not an execution
    else if (df.rdd.getNumPartitions < target) df.repartition(target)
    else df
  }

  /** Unconditional round-robin spread for SMALL-BYTES / HEAVY-CPU frames
    * (candidate pair lists feeding per-row set/array comparisons). AQE
    * coalesces post-shuffle partitions by BYTE size, so a few-MB pair
    * list collapses to one or two partitions — and the verify stage that
    * follows does quadratic-ish per-row work on one core (measured: the
    * d5b verify stage went 32-way → serial, 10× wall). [[ensure]] cannot
    * help: probing a post-shuffle frame's partitioning would execute it
    * (see above). The exchange this inserts is priced in bytes (small by
    * premise) and buys back full-cluster CPU for the expensive stage; at
    * scale a big candidate list pays one cheap extra shuffle.
    */
  def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** Key-clustered variant of [[spread]] for the INPUTS of a self-join
    * whose per-bucket pair expansion is the expensive stage: an explicit
    * partition COUNT makes the exchange non-coalescable (AQE leaves
    * user-numbered repartitions alone), so the join — and the per-pair
    * work fused into its tasks — keeps full width instead of collapsing
    * to the one partition its few input MB would coalesce to. Both join
    * sides get the same clustering, so no further exchange is added.
    * Effective parallelism is still bounded by the number of distinct
    * keys — inherent to any blocked join.
    */
  def spreadBy(df: DataFrame, keys: org.apache.spark.sql.Column*): DataFrame =
    df.repartition(
      df.sparkSession.sparkContext.defaultParallelism, keys: _*)
}
