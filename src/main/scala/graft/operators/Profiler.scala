package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset PROFILING (the data-quality stats pass every ingest runs —
  * the deequ/Great-Expectations shape): per column, non-null count,
  * exact distinct count, and lexicographic/numeric min-max, emitted
  * LONG-FORM (`col_name, n_rows, n_nonnull, n_distinct, min_s, max_s`)
  * so a governance table can union profiles across datasets and dates.
  *
  * ONE scan computes every metric: all per-column aggregates ride in a
  * single `agg(...)` (Catalyst plans the multi-distinct via Expand —
  * still one pass over the data), the 1-row wide result is materialized
  * once and melted to long form without recomputation. Min/max are cast
  * to strings so the frame is schema-stable across column types —
  * integer casts render identically cross-engine, which keeps the
  * profile oracle-checkable.
  */
object Profiler {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"nn_$c"),
        countDistinct(col(c)).as(s"nd_$c"),
        min(col(c)).cast("string").as(s"mn_$c"),
        max(col(c)).cast("string").as(s"mx_$c"))
    }
    val wide = df
      .agg(count(lit(1)).as("n_rows"), aggs: _*)
      .localCheckpoint() // 1 row; melting must not re-run the scan
    cols.map { c =>
      wide.select(
        lit(c).as("col_name"),
        col("n_rows"),
        col(s"nn_$c").as("n_nonnull"),
        col(s"nd_$c").as("n_distinct"),
        col(s"mn_$c").as("min_s"),
        col(s"mx_$c").as("max_s"))
    }.reduce(_ union _)
  }
}
