package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** COUNT-MIN SKETCH (Cormode & Muthukrishnan 2005) over the corpus
  * token stream — the point-query frequency sketch that completes the
  * sketch family: q14's HLL answers "how many distinct", d25's
  * Misra-Gries answers "which are the heavy hitters", CMS answers
  * "how often does THIS item occur" for any item, in `depth × width`
  * counters regardless of corpus size, with the one-sided guarantee
  * est ≥ true (never under) and est ≤ true + ε·N with probability
  * 1 − δ (ε = e/width, δ = e^−depth).
  *
  * All `depth` hash rows are md5-derived (`md5("cms-v1:" + row + ":" +
  * token)` → 60-bit long → mod width), so the sketch — and every
  * estimate read from it — is deterministic, partitioning-independent,
  * and replayable in the oracle engine cell for cell.
  *
  * Scale shape (the reason a 100 TB pipeline keeps one of these): the
  * build is ONE map-side-combined hash aggregate keyed on (row, cell) —
  * key cardinality ≤ depth·width, a few thousand, so the shuffle
  * carries the SKETCH, not the corpus; the sketch is MERGEABLE by
  * construction (cell-wise sum — counts distribute over unions), so
  * per-shard sketches fold into the corpus sketch with no re-scan
  * (unit-locked); point queries broadcast-join the tiny sketch table.
  */
object CountMin {

  private val Salt = "cms-v1"

  /** `cell = md5-60bit("cms-v1:" + r + ":" + token) mod width` — the
    * r-th row's hash, identical arithmetic in DuckDB.
    */
  private def cell(
      r: org.apache.spark.sql.Column,
      tok: org.apache.spark.sql.Column,
      width: Int) =
    pmod(
      conv(
        substring(
          md5(concat_ws(":", lit(Salt), r.cast("string"), tok)), 1, 15),
        16, 10).cast("long"),
      lit(width.toLong))

  /** Build the sketch from a token stream: one row per NON-EMPTY
    * counter — `(r, cell, cnt)`, at most depth·width rows total.
    * `toks` must carry a string column `t` (one row per token
    * occurrence).
    */
  def sketch(toks: DataFrame, depth: Int = 3, width: Int = 128): DataFrame = {
    require(depth >= 1, "depth must be >= 1")
    require(width >= 2, "width must be >= 2")
    toks
      .select(
        posexplode(
          transform(
            sequence(lit(0), lit(depth - 1)),
            r => cell(r, col("t"), width))).as(Seq("r", "cell")))
      .groupBy(col("r"), col("cell"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-query EVERY distinct corpus token against the sketch and
    * report the estimate next to the exact count — the accuracy audit a
    * pipeline runs at fixture scale before trusting the sketch at 100×
    * (at scale only the probe side shrinks; the sketch stays
    * depth·width).
    *
    * est(tok) = min over rows r of counter[r][cell_r(tok)] — the
    * count-min rule; `overest = est − cnt_true ≥ 0` is the theorem made
    * a column (unit-locked; oracle-locked row for row).
    *
    * Output: `tok, cnt_true, est, overest`.
    */
  def pointEstimates(
      docs: DataFrame, depth: Int = 3, width: Int = 128): DataFrame = {
    val (out, toks) = pointEstimatesStage(docs, depth, width)
    CacheScope.sealAfter(out, toks)
  }

  /** [[pointEstimates]] BEFORE the seal — the lazy plan plus the
    * persisted token stream, exposed so PlanSpec can audit the
    * broadcast sketch join (the sealed public result is a checkpoint
    * scan).
    */
  private[graft] def pointEstimatesStage(
      docs: DataFrame, depth: Int, width: Int): (DataFrame, DataFrame) = {
    // 3 md5s per token run before the sketch agg's shuffle, on scan
    // partitioning — ensure() restores parallelism on a one-file
    // fixture (no-op at production split counts). PERSISTED: the token
    // stream feeds BOTH the sketch build and the exact-count probe
    // aggregate — unpersisted, the scan + tokenize + explode would run
    // twice (the substringSpans grams-persist rationale).
    val toks = graft.core.Parallelism.ensure(docs)
      .filter(length(trim(col("text"))) > 0)
      .select(explode(TextOps.tokens(col("text"))).as("t"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sk = sketch(toks, depth, width)
    val probes = toks.groupBy(col("t")).agg(count(lit(1)).as("cnt_true"))
    val out = probes
      .select(
        col("t"), col("cnt_true"),
        posexplode(
          transform(
            sequence(lit(0), lit(depth - 1)),
            r => cell(r, col("t"), width))).as(Seq("r", "cell")))
      // the sketch is ≤ depth·width rows — broadcast it; every (r,cell)
      // a probe computes exists in the sketch (the probe tokens ARE the
      // build tokens), so the inner join is total
      .join(broadcast(sk), Seq("r", "cell"))
      .groupBy(col("t").as("tok"), col("cnt_true"))
      .agg(min(col("cnt")).as("est"))
      .select(
        col("tok"), col("cnt_true"), col("est"),
        (col("est") - col("cnt_true")).as("overest"))
    (out, toks)
  }
}
