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

  /** Backtick-quote a column name for exact-match resolution: dots in a
    * raw name would otherwise resolve as nested-field access (a legal
    * parquet column named `a.b` would miss or grab the wrong field),
    * and embedded backticks escape by doubling (the Spark identifier
    * rule).
    */
  private def quoted(c: String): String = "`" + c.replace("`", "``") + "`"

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    // intermediate aliases are POSITIONAL (nn_0, nd_0, …): splicing the
    // raw name into an alias breaks on dots/backticks even when the
    // input side resolves — the user-visible name appears only as the
    // col_name literal in the melted output
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      val in = col(quoted(c))
      Seq(
        count(in).as(s"nn_$i"),
        countDistinct(in).as(s"nd_$i"),
        min(in).cast("string").as(s"mn_$i"),
        max(in).cast("string").as(s"mx_$i"))
    }
    val wide = df
      .agg(count(lit(1)).as("n_rows"), aggs: _*)
      .localCheckpoint() // 1 row; melting must not re-run the scan
    cols.zipWithIndex.map { case (c, i) =>
      wide.select(
        lit(c).as("col_name"),
        col("n_rows"),
        col(s"nn_$i").as("n_nonnull"),
        col(s"nd_$i").as("n_distinct"),
        col(s"mn_$i").as("min_s"),
        col(s"mx_$i").as("max_s"))
    }.reduce(_ union _)
  }
}
