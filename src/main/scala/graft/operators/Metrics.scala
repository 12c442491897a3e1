package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Evaluation metrics for the data-pipeline's model-facing artifacts —
  * the statistics a team computes to decide whether a quality
  * classifier, dedup threshold, or sampling policy is good enough to
  * ship. Everything here follows the repo's determinism discipline:
  * integer or integer-ratio arithmetic wherever possible, explicit
  * rounding at every float boundary, no randomness.
  */
object Metrics {

  /** ROC-AUC of `score` against boolean `label`, by the Mann–Whitney
    * rank statistic: AUC = (Σ_pos avgrank − P(P+1)/2) / (P·N), with
    * average ranks over score ties (the exact trapezoidal ROC area).
    *
    * Scale shape: one hash aggregate groups the corpus by score (the
    * only corpus-sized pass), then the cumulative count runs over the
    * GROUPED frame with a two-level prefix sum — range-repartition by
    * score, per-partition window cumsum, plus driver-collected
    * per-partition offsets (a |partitions|-row action) broadcast back.
    * No global single-partition window anywhere: the classic
    * `ORDER BY score` cumsum bottleneck is what this operator exists
    * to avoid at 100 TB. The result does not depend on where the range
    * partitioner draws its boundaries — offsets are computed from the
    * actual partition totals, and rows of one score never straddle a
    * boundary's correctness (sum is associative across the split).
    *
    * Output: ONE row `auc DOUBLE (6 dp), n_pos LONG, n_neg LONG`.
    */
  def rocAuc(df: DataFrame, score: Column, label: Column): DataFrame = {
    val parts = df.sparkSession.conf
      .get("spark.sql.shuffle.partitions").toInt
    val grouped = df
      .select(score.as("s"), label.cast("boolean").as("y"))
      // a NULL score or label is an unscoreable row, not a rank: drop
      // it explicitly — engines disagree on where NULL sorts (Spark
      // windows default NULLS FIRST, DuckDB's cumulative NULLS LAST),
      // so letting NULLs ride would shift every real rank by their
      // count on one side only
      .filter(col("s").isNotNull && col("y").isNotNull)
      .groupBy(col("s"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("y").cast("long")).as("np"))
      .repartitionByRange(parts, col("s"))
      .withColumn("pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // per-partition totals: |partitions| rows, driver-bounded
    val offsets = grouped.groupBy(col("pid"))
      .agg(sum(col("n")).as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val cumBefore = offsets.keys.toSeq.sorted
      .scanLeft((Int.MinValue, 0L)) { case ((_, acc), p) =>
        (p, acc + offsets(p))
      }
      .sliding(2).collect { case Seq((_, acc), (p, _)) => (p, acc) }
      .toMap
    val offCol = coalesce(
      element_at(
        map(cumBefore.toSeq.flatMap { case (p, o) =>
          Seq(lit(p), lit(o))
        }: _*),
        col("pid")),
      lit(0L))
    val w = Window.partitionBy(col("pid")).orderBy(col("s"))
    val ranked = grouped.withColumn(
      "cb", sum(col("n")).over(w) - col("n") + offCol)
    // Σ_pos avgrank folds in one aggregate over the grouped frame;
    // P and N ride the same pass
    val out = ranked.agg(
      sum(col("np") * (col("cb") + (col("n") + 1) / lit(2.0))).as("sr"),
      sum(col("np")).as("p"),
      sum(col("n") - col("np")).as("q"))
      .select(
        // P and N cast to double BEFORE the products — P·N and P·(P+1)
        // overflow long at web-scale corpus sizes, and doubles keep
        // them exact to 2^53 (identical in both engines)
        round(
          (col("sr")
            - col("p").cast("double") * (col("p") + 1).cast("double")
              / lit(2.0))
            / (col("p").cast("double") * col("q").cast("double")),
          6).as("auc"),
        col("p").as("n_pos"),
        col("q").as("n_neg"))
    CacheScope.sealAfter(out, grouped)
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009): merge ranked lists
    * by Σ 1/(c + rank) — the standard hybrid-search combiner (lexical
    * BM25 + semantic kNN in p6). Each input carries `doc_id, rank`;
    * a doc absent from a list simply contributes nothing from it. One
    * union + one k-bounded hash aggregate over frames that are already
    * k-bounded by their producers — nothing corpus-sized. Scores round
    * to 9 dp; ties break to the lowest id (two-list sums are exact-
    * commutative in fp; for >2 lists the 9-dp round absorbs fold
    * order, contributions being ≥ 1/(c + maxRank) ≫ 1e-9).
    */
  def rrfFuse(lists: Seq[DataFrame], k: Int, c: Int = 60): DataFrame = {
    require(lists.nonEmpty && k >= 1, "need lists and k >= 1")
    lists
      .map(_.select(
        col("doc_id"),
        (lit(1.0) / (lit(c) + col("rank"))).as("contrib")))
      .reduce(_ unionByName _)
      .groupBy(col("doc_id"))
      .agg(
        round(sum(col("contrib")), 9).as("rrf"),
        count(lit(1)).as("n_lists"))
      .orderBy(desc("rrf"), asc("doc_id"))
      .limit(k)
  }

  /** CALIBRATION (reliability) bins for a scored binary label — the
    * diagram a team reads before trusting a quality classifier's
    * probabilities, and the per-bin table ECE sums over. Binning is
    * RANK-based (`ntile` over (score, id) — the d40 discipline: no
    * float bin-edge can disagree cross-engine); each bin reports its
    * size, mean score ("confidence") and positive rate ("accuracy").
    * One window sort + one map-side-combined aggregate; the window
    * partitions by nothing but operates on (score, id) — at 100 TB use
    * [[calibrationBinsApprox]], the registered sketch-edge twin (d49b),
    * which removes the global sort entirely.
    *
    * Output per bin: `bin, n, mean_score, pos_rate` (+ the |gap|
    * each bin contributes to ECE before weighting).
    */
  def calibrationBins(
      df: DataFrame,
      score: Column,
      label: Column,
      id: Column,
      bins: Int = 10): DataFrame = {
    val w = Window.orderBy(col("s"), col("i"))
    df.select(
        score.as("s"), label.cast("boolean").as("y"), id.as("i"))
      .withColumn("bin", ntile(bins).over(w).cast("long"))
      .groupBy(col("bin"))
      .agg(
        count(lit(1)).as("n"),
        round(avg(col("s")), 6).as("mean_score"),
        round(avg(col("y").cast("double")), 6).as("pos_rate"))
      .withColumn(
        "gap", round(abs(col("mean_score") - col("pos_rate")), 6))
  }

  /** The 100 TB twin of [[calibrationBins]] — the swap that method's
    * Scaladoc documents, made executable: `approx_percentile` computes
    * the `bins − 1` interior score edges in ONE map-side-combined
    * sketch aggregate (no global sort anywhere), the 1-row edge frame
    * broadcasts, and binning becomes a STATELESS projection — bin =
    * 1 + #(edges strictly below the score), unrolled into `bins − 1`
    * codegen'd comparisons (no interpreted array lambda in the hot
    * path). Same output schema as the exact form; bin MEMBERSHIP near
    * sketch edges is engine-defined (the q14/q20 sketch-accuracy
    * stance), so the row registers rows-only with the accuracy spec
    * pinning near-equal bin sizes and monotone mean scores against the
    * exact twin.
    *
    * DENSE domain guarantee: heavy score ties can make several sketch
    * edges EQUAL, leaving some bins with no rows — unlike the exact
    * ntile twin, which always fills 1..bins. A downstream ECE
    * weighting that assumes a dense bin domain would silently skip the
    * gaps, so empty bins are emitted explicitly with `n = 0` and NULL
    * mean_score/pos_rate/gap (no rows ⇒ no means; NULL, not a fake
    * 0.0, so nothing averages them in).
    */
  def calibrationBinsApprox(
      df: DataFrame,
      score: Column,
      label: Column,
      bins: Int = 10,
      accuracy: Int = 10000): DataFrame = {
    require(bins >= 2, "need bins >= 2")
    val probs = array(
      (1 until bins).map(i => lit(i.toDouble / bins)): _*)
    val edges = df
      .agg(percentile_approx(score, probs, lit(accuracy)).as("edges"))
    val binCol = (1 until bins).foldLeft(lit(1L)) { (acc, i) =>
      acc + when(col("s") > element_at(col("edges"), i), 1L).otherwise(0L)
    }
    val filled = df.select(score.as("s"), label.cast("boolean").as("y"))
      .crossJoin(broadcast(edges))
      .withColumn("bin", binCol)
      .groupBy(col("bin"))
      .agg(
        count(lit(1)).as("n"),
        round(avg(col("s")), 6).as("mean_score"),
        round(avg(col("y").cast("double")), 6).as("pos_rate"))
      .withColumn(
        "gap", round(abs(col("mean_score") - col("pos_rate")), 6))
    // dense 1..bins domain (see Scaladoc): a bins-row generated frame
    // left-joins the aggregate, so tie-emptied bins surface as n = 0
    df.sparkSession.range(1, bins + 1).toDF("bin")
      .join(filled, Seq("bin"), "left_outer")
      .select(
        col("bin"), coalesce(col("n"), lit(0L)).as("n"),
        col("mean_score"), col("pos_rate"), col("gap"))
  }

  /** Winsorized (percentile-clipped) per-group summary of a numeric
    * feature — the outlier-control preprocessing a tabular trainer
    * runs. Exact linear-interpolated percentiles (`percentile`, the
    * same type-7 interpolation DuckDB's `quantile_cont` uses) computed
    * per group in one aggregate pass, joined back (group-keyed: the
    * percentile frame is |groups|-bounded, statistics pick broadcast),
    * then ONE clipped re-aggregation. Two corpus passes total — the
    * percentile itself is the irreducible first pass; at 100 TB swap
    * `percentile` for `approx_percentile` (the q20 sketch path) to
    * fold it into one.
    *
    * Output per group: the clip bounds, how many rows each side
    * clipped, and the winsorized mean.
    */
  def winsorize(
      df: DataFrame,
      group: Column,
      value: Column,
      lo: Double = 0.05,
      hi: Double = 0.95): DataFrame = {
    val bounds = df
      .groupBy(group.as("g"))
      .agg(
        percentile(value, lit(lo)).as("p_lo"),
        percentile(value, lit(hi)).as("p_hi"))
    df.select(group.as("g"), value.as("v"))
      .join(bounds, Seq("g"))
      .groupBy(col("g"))
      .agg(
        count(lit(1)).as("n"),
        sum((col("v") < col("p_lo")).cast("long")).as("n_clip_lo"),
        sum((col("v") > col("p_hi")).cast("long")).as("n_clip_hi"),
        round(
          avg(greatest(least(col("v"), col("p_hi")), col("p_lo"))), 6)
          .as("mean_winsorized"),
        round(min(col("p_lo")), 6).as("p_lo"),
        round(min(col("p_hi")), 6).as("p_hi"))
  }
}
