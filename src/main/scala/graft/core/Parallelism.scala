package graft.core

import org.apache.spark.sql.DataFrame

/** Row-level parallelism guard for compute-heavy narrow stages.
  *
  * A Parquet scan parallelizes at file/row-group granularity, so a small
  * fixture (one file, one row group) hands ALL of a stage's work to one
  * task — tokenize/shingle/hash projections and the stream side of a
  * broadcast join then run single-core no matter how many executor
  * threads exist. At production scale a scan has thousands of splits and
  * this guard is a NO-OP; on an unsplittable tiny input it spends one
  * cheap exchange to restore parallelism for the expensive stage that
  * follows. (`getNumPartitions` inspects the planned scan — no job runs.)
  */
object Parallelism {

  def ensure(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
