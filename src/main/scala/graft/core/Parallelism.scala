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
}
