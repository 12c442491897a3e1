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

  /** A row-level expectation: `violation` is TRUE exactly on rows that
    * BREAK the constraint (nulls in the predicate count as violations —
    * an unevaluable expectation must not silently pass).
    */
  final case class RowCheck(
      name: String, violation: org.apache.spark.sql.Column)

  /** Constraint EXPECTATIONS — [[profile]]'s judging twin (the
    * deequ `Check` / dbt-test / Great Expectations shape): declarative
    * constraints evaluated against a frame, one summary row per
    * constraint (`check_name, n_violations, pass`). Three constraint
    * classes, each priced at its natural cost and no more:
    *
    *  - ROW checks (not-null, range, regex, …): ALL of them ride ONE
    *    zero-shuffle scan as conditional sums — adding a check adds a
    *    column to the aggregate, never a pass over the data;
    *  - UNIQUENESS of a key tuple: one hash aggregate;
    *    `n_violations` = surplus rows (n_rows − n_distinct_keys), so 0
    *    ⇔ the tuple is a key. NULL SEMANTICS (pinned by unit test, not
    *    an accident of the engine): Spark's multi-column
    *    `countDistinct` drops any tuple with a NULL component, so EVERY
    *    null-key row counts as a violation — the primary-key reading
    *    (a PK must be non-null AND unique), not the SQL UNIQUE-
    *    constraint reading (which ignores nulls). An oracle mirroring
    *    this in an engine whose `count(DISTINCT (a,b))` keeps
    *    null-bearing structs (DuckDB) must null-guard the tuple:
    *    `count(*) − count(DISTINCT CASE WHEN a IS NOT NULL AND b IS
    *    NOT NULL THEN (a,b) END)`. EXACT by design — a uniqueness
    *    constraint is a correctness gate, and its cost is one
    *    key-tuple exchange (what any PK validation pays); callers who
    *    only need a drift signal at 100 TB use
    *    [[expectationsApproxUnique]] (the q51c HLL path) at the price
    *    of false passes within the sketch's rsd;
    *  - REFERENTIAL integrity (fact key ⊆ dim key): one anti-join
    *    count of fact rows whose NON-NULL key misses the dim
    *    (null-key rows are the not-null check's business, not the
    *    FK's); statistics drive the dim side to broadcast when it
    *    fits — no hint.
    *
    * The summary is a union of 1-row aggregates — constraint-count
    * rows, nothing data-sized leaves the executors. Quarantine of the
    * offending rows themselves is [[quarantineRows]].
    */
  def expectations(
      df: DataFrame,
      rowChecks: Seq[RowCheck],
      uniqueKeys: Seq[(String, Seq[String])] = Nil,
      foreignKeys: Seq[(String, String, DataFrame, String)] = Nil)
      : DataFrame = {
    require(
      rowChecks.nonEmpty || uniqueKeys.nonEmpty || foreignKeys.nonEmpty,
      "need at least one constraint")
    val parts = scala.collection.mutable.ListBuffer[DataFrame]()
    if (rowChecks.nonEmpty) {
      // checkpointed so melting one row per constraint does not re-run
      // the scan per constraint
      val wide = rowCheckWide(df, rowChecks).localCheckpoint()
      rowChecks.zipWithIndex.foreach { case (c, i) =>
        parts += wide.select(
          lit(c.name).as("check_name"),
          col(s"v_$i").as("n_violations"))
      }
    }
    uniqueKeys.foreach { case (name, keyCols) =>
      parts += df
        .agg(
          (count(lit(1)) -
            countDistinct(keyCols.head, keyCols.tail: _*))
            .as("n_violations"))
        .select(lit(name).as("check_name"), col("n_violations"))
    }
    foreignKeys.foreach { case (name, factKey, dim, dimKey) =>
      parts += df
        .filter(col(factKey).isNotNull)
        .join(
          dim.select(col(dimKey).as(factKey)).distinct(),
          Seq(factKey), "left_anti")
        .agg(count(lit(1)).as("n_violations"))
        .select(lit(name).as("check_name"), col("n_violations"))
    }
    parts.reduce(_ union _)
      .withColumn("pass", (col("n_violations") === 0L).cast("boolean"))
  }

  /** APPROXIMATE-uniqueness expectations (q51c) — the registered form of
    * the escape hatch [[expectations]]' uniqueness bullet documents: at
    * 100 TB a DAILY uniqueness check is a drift signal, not a
    * correctness gate, and the HLL++ sketch (`approx_count_distinct`)
    * prices it at ONE ZERO-EXCHANGE SCAN — constant sketch state per
    * key tuple instead of the exact form's key-tuple exchange. ALL keys
    * ride a single `agg(...)` (HLL sketches compose in one pass; the
    * exact multi-distinct would force an Expand), so adding a key adds
    * a sketch, never a scan.
    *
    * Null semantics mirror the exact check exactly: a tuple with any
    * NULL component never reaches the sketch (the `when` guard yields
    * NULL, which `approx_count_distinct` ignores), so every null-key
    * row counts toward the surplus.
    *
    * Output: `check_name, n_violations_est, pass_est`. The estimate
    * errs BOTH ways within the sketch's rsd, so the verdict thresholds
    * at the sketch's NOISE FLOOR — `pass_est` ⇔ the estimated surplus
    * is ≤ `ceil(noiseFactor · rsd · n_distinct_est)` — never at zero:
    * a zero threshold would false-FAIL every clean key whose estimate
    * undershoots. The symmetric price is the FALSE PASS: a true
    * surplus under the noise floor reads clean (bounded by the rsd,
    * unit-pinned). A negative `n_violations_est` (overshooting
    * estimate on a clean key) is reported as-is — consumers trend the
    * raw number. Anything beyond a drift signal belongs on
    * [[expectations]].
    */
  def expectationsApproxUnique(
      df: DataFrame,
      uniqueKeys: Seq[(String, Seq[String])],
      rsd: Double = 0.01,
      noiseFactor: Double = 3.0): DataFrame = {
    require(uniqueKeys.nonEmpty, "need at least one unique-key constraint")
    require(rsd > 0.0 && rsd < 1.0, "rsd must be in (0, 1)")
    require(noiseFactor > 0.0, "noiseFactor must be positive")
    val aggs = uniqueKeys.zipWithIndex.map { case ((_, keyCols), i) =>
      val tuple = when(
        keyCols.map(c => col(quoted(c)).isNotNull).reduce(_ && _),
        struct(keyCols.map(c => col(quoted(c))): _*))
      approx_count_distinct(tuple, rsd).as(s"nd_$i")
    }
    // checkpointed 1-row frame: melting per key must not re-run the scan
    val wide = df
      .agg(count(lit(1)).as("n_rows"), aggs: _*)
      .localCheckpoint()
    uniqueKeys.zipWithIndex.map { case ((name, _), i) =>
      val est = col("n_rows") - col(s"nd_$i")
      wide.select(
        lit(name).as("check_name"),
        est.as("n_violations_est"),
        (est <= ceil(lit(noiseFactor * rsd) * col(s"nd_$i")).cast("long"))
          .as("pass_est"))
    }.reduce(_ union _)
  }

  /** The one-scan wide aggregate behind the row checks (one conditional
    * sum per check; nulls violate) — exposed pre-checkpoint so the plan
    * audit can assert all checks share a single scan (the
    * boilerplateStages discipline).
    */
  private[graft] def rowCheckWide(
      df: DataFrame, rowChecks: Seq[RowCheck]): DataFrame = {
    val aggs = rowChecks.zipWithIndex.map { case (c, i) =>
      sum(
        when(coalesce(c.violation, lit(true)), lit(1L)).otherwise(lit(0L)))
        .as(s"v_$i")
    }
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** The QUARANTINE split for the scan-expressible subset: rows failing
    * any row check, labeled with the FIRST failing constraint in
    * declaration order (the d24 first-failing-reason discipline) — the
    * frame an ingest pipeline writes to its dead-letter store while the
    * clean rows continue. Stateless zero-exchange projection + filter.
    */
  def quarantineRows(
      df: DataFrame, rowChecks: Seq[RowCheck]): DataFrame =
    df.withColumn("quarantine_reason", quarantineReason(rowChecks))
      .filter(col("quarantine_reason").isNotNull)

  /** The first-failing-constraint reason as a bare Column (NULL ⇔ the
    * row passes every check) — the single expression behind
    * [[quarantineRows]] and the streaming gate
    * ([[graft.streaming.EventStreams.gatedIngest]]), shared so the
    * batch and streaming splits cannot drift.
    */
  def quarantineReason(
      rowChecks: Seq[RowCheck]): org.apache.spark.sql.Column = {
    require(rowChecks.nonEmpty, "need at least one row check")
    rowChecks.reverse.foldLeft(
      lit(null).cast("string")) { (acc, c) =>
      when(coalesce(c.violation, lit(true)), lit(c.name)).otherwise(acc)
    }
  }
}
