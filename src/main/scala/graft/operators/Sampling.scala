package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling / split assignment for training-data curation —
  * the operations that decide which documents a 100 TB corpus actually
  * contributes to a training run.
  *
  * All decisions are pure functions of (id, salt) via md5, never of
  * partitioning, row order, or an RNG stream: re-running on a different
  * cluster layout (or in DuckDB, for the oracle) reproduces the same
  * split bit-for-bit. This is the property `DataFrame.sample`/`rand()`
  * cannot give — their draws depend on partition layout, which reshuffles
  * under AQE and repartitioning.
  *
  * Scale shape: split assignment is a stateless per-row projection (no
  * shuffle); the per-stratum cap is one window partitioned by the
  * stratum key — a single hash exchange, the same cost class as any
  * grouped aggregate. Hashes are md5 (not xxhash64) so any engine can
  * recompute the decision — see [[TextOps.fingerprint]] for the same
  * trade.
  */
object Sampling {

  /** Uniform [0, 100) bucket from the md5 of (id, salt): the first 8 hex
    * chars are a 32-bit value — comfortably exact in a long — reduced
    * mod 100. Changing `salt` draws an independent split.
    */
  def hashBucket(id: Column, salt: String): Column =
    pmod(
      conv(substring(md5(concat_ws(":", id.cast("string"), lit(salt))), 1, 8),
        16, 10).cast("long"),
      lit(100L))

  /** Train/validation/test split assignment: deterministic per-id
    * percentage buckets (`trainPct` + `valPct` + rest). One stateless
    * projection — no shuffle, no state, stable under any partitioning.
    */
  def assignSplit(
      docs: DataFrame,
      idCol: String = "doc_id",
      trainPct: Int = 90,
      valPct: Int = 5,
      salt: String = "split-v1"): DataFrame = {
    require(trainPct + valPct <= 100, "trainPct + valPct must be <= 100")
    val b = hashBucket(col(idCol), salt)
    docs.withColumn(
      "split",
      when(b < trainPct, lit("train"))
        .when(b < trainPct + valPct, lit("val"))
        .otherwise(lit("test")))
  }

  /** Per-stratum quota sampling ("domain cap"): keep at most `cap` rows
    * per stratum, chosen by hash order (deterministic, uniform within
    * the stratum — NOT first-seen order, which would bias toward
    * whatever happened to be written first). `kept = 1` marks survivors;
    * callers filter or weight on it.
    */
  def stratumCap(
      docs: DataFrame,
      stratumCol: String,
      cap: Int,
      idCol: String = "doc_id",
      salt: String = "cap-v1"): DataFrame = {
    val h = md5(concat_ws(":", col(idCol).cast("string"), lit(salt)))
    val w = Window.partitionBy(col(stratumCol)).orderBy(h.asc, col(idCol).asc)
    docs
      .withColumn("cap_rank", row_number().over(w))
      .withColumn(
        "kept",
        when(col("cap_rank") <= cap, lit(1)).otherwise(lit(0)))
  }

  /** Sequence packing for training: concatenate each shard's documents
    * (in deterministic `idCol` order) into one token stream and cut it
    * into fixed `budget`-token training sequences; each document reports
    * the sequence its first token lands in and its offset there. This is
    * the bookkeeping a packed-pretraining dataloader needs, computed as
    * one windowed cumulative sum.
    *
    * The window partitions by `shardCol` — packing is PER SHARD by
    * design, not global: a single global token order would serialize the
    * window into one partition (the classic scale-killer), and training
    * pipelines shard-pack anyway (sequences never need to cross file/
    * source boundaries, loaders consume shards independently). At 100 TB
    * this is one hash exchange on the shard key, each shard's running
    * sum evaluated in parallel. Output: `doc_id, <shardCol>, n_tokens,
    * start_offset, seq_id, seq_offset`.
    */
  def packSequences(
      docs: DataFrame,
      budget: Int,
      shardCol: String = "source",
      idCol: String = "doc_id"): DataFrame = {
    require(budget >= 1, "budget must be >= 1")
    val nTok = TextOps.tokenCount(col("text"))
    val w = Window.partitionBy(col(shardCol)).orderBy(col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col(idCol), col(shardCol), nTok.as("n_tokens"))
      .withColumn("start_offset", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .select(
        col(idCol), col(shardCol), col("n_tokens"), col("start_offset"),
        (col("start_offset") / budget).cast("long").as("seq_id"),
        pmod(col("start_offset"), lit(budget.toLong)).as("seq_offset"))
  }

  /** Domain-mixture sampling (the pretraining "data mixture" step):
    * keep each document with its source's target probability,
    * deterministically — doc d from source s survives iff the 20-bit
    * value of md5(d || ':' || salt) falls below ratio(s)·2²⁰. A pure
    * stateless projection (no shuffle, no RNG): the mixture is
    * reproducible under any partitioning and any engine, and changing
    * `salt` redraws it. Sources absent from `ratios` keep
    * `defaultRatio`. 20-bit granularity bounds the ratio quantization
    * error at 2⁻²⁰ — the hash is uniform, so realized rates concentrate
    * tightly around the targets at corpus scale. Output: input columns +
    * `mix_bucket` (the 20-bit draw) + `kept` (0/1).
    */
  def mixtureSample(
      docs: DataFrame,
      ratios: Map[String, Double],
      defaultRatio: Double = 1.0,
      shardCol: String = "source",
      idCol: String = "doc_id",
      salt: String = "mix-v1"): DataFrame = {
    require(
      (ratios.values ++ Seq(defaultRatio)).forall(r => r >= 0 && r <= 1),
      "ratios must be in [0, 1]")
    val bucket = conv(
      substring(md5(concat_ws(":", col(idCol).cast("string"), lit(salt))),
        1, 5),
      16, 10).cast("long")
    val threshold = ratios.foldLeft(lit(defaultRatio)) {
      case (acc, (src, r)) =>
        when(col(shardCol) === src, lit(r)).otherwise(acc)
    } * (1L << 20)
    docs
      .withColumn("mix_bucket", bucket)
      .withColumn(
        "kept",
        when(col("mix_bucket") < threshold, lit(1)).otherwise(lit(0)))
  }

  /** Deterministic training order (the corpus "global shuffle" a
    * dataloader needs, without a global sort): each doc draws a shard
    * `md5-hash mod numShards` and a position by hash order within the
    * shard. ONE window exchange partitioned by shard — shards order in
    * parallel (the classic global-orderBy would serialize into a single
    * range sort at 100 TB, and loaders consume shards independently
    * anyway). Changing `seed` redraws the whole permutation; both the
    * shard draw and the in-shard order are md5 column algebra, so any
    * engine reproduces the exact order. Output: `doc_id, shard, pos`.
    */
  def trainingOrder(
      docs: DataFrame,
      numShards: Int,
      idCol: String = "doc_id",
      seed: String = "order-v1"): DataFrame = {
    require(numShards >= 1, "numShards must be >= 1")
    val h = md5(concat_ws(":", lit(seed), col(idCol).cast("string")))
    val shard = pmod(
      conv(substring(h, 1, 8), 16, 10).cast("long"), lit(numShards.toLong))
    val w = Window.partitionBy(col("shard")).orderBy(col("h").asc, col(idCol).asc)
    docs
      .select(col(idCol), shard.as("shard"), h.as("h"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col(idCol), col("shard"), col("pos"))
  }

  /** TEMPERATURE-scaled mixture sampling (the multilingual/multi-domain
    * rebalancing rule from the mBERT/XLM-R/mT5 line of work): the target
    * share of source s is `n_s^α / Σ_t n_t^α` — α < 1 flattens the
    * mixture toward small sources, α = 1 keeps natural proportions. Each
    * source's keep probability is `min(1, targetFrac · N · share / n_s)`
    * and every document draws the d21 deterministic 20-bit md5 bucket
    * against `floor(round(p_s, 9) · 2^20)` — an INTEGER threshold
    * compare, so no float sits on the keep/drop boundary.
    *
    * α is fixed at 0.5 (the common temperature T = 2): `n^0.5` is IEEE
    * sqrt, which every engine rounds identically — a general `pow` can
    * differ by an ulp across libms and would un-anchor the oracle. The
    * cross-source denominator Σ √n_t is an ordered left-assoc running
    * sum (window ordered by source, last row), not a float `sum()` whose
    * order the engine picks — the d26 sorted-fold discipline applied to
    * an aggregate of ~|sources| rows.
    *
    * Scale shape: one |sources|-bounded count aggregate, a window over
    * those few rows, one hint-free join of the per-source threshold back
    * to the corpus (statistics will broadcast it — d17 discipline), and
    * the stateless draw. Output: `<idCol>, <shardCol>, n_source,
    * keep_threshold, mix_bucket, kept`.
    */
  def temperatureSample(
      docs: DataFrame,
      targetFrac: Double,
      shardCol: String = "source",
      idCol: String = "doc_id",
      salt: String = "temp-v1"): DataFrame = {
    require(targetFrac > 0 && targetFrac <= 1, "targetFrac must be in (0, 1]")
    val wRun = Window.orderBy(col(shardCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // per-source counts with the √n temperature numerator and the
    // ordered running denominator; denom = the running sum's final row
    // (counts are positive, so max(cum) IS the ordered total)
    val counts = docs.groupBy(col(shardCol))
      .agg(count(lit(1)).as("n_source"))
      .withColumn("sq", sqrt(col("n_source").cast("double")))
      .withColumn("cum_sq", sum(col("sq")).over(wRun))
      .localCheckpoint() // |sources| rows; consumed three times below
    val denom = counts.agg(max(col("cum_sq")).as("denom"))
    // the corpus total is the sum of the per-source counts — derived
    // from the tiny frame, not a second full scan
    val total = counts.agg(sum(col("n_source")).as("n_total"))
    val thresholds = counts
      .crossJoin(denom).crossJoin(total)
      .withColumn(
        "p_keep",
        least(
          lit(1.0),
          round(
            lit(targetFrac) * col("n_total") * col("sq") / col("denom") /
              col("n_source"),
            9)))
      .select(
        col(shardCol), col("n_source"),
        floor(col("p_keep") * (1L << 20)).cast("long").as("keep_threshold"))
    val bucket = conv(
      substring(md5(concat_ws(":", col(idCol).cast("string"), lit(salt))),
        1, 5),
      16, 10).cast("long")
    docs
      .select(col(idCol), col(shardCol))
      .join(thresholds, Seq(shardCol))
      .withColumn("mix_bucket", bucket)
      .withColumn(
        "kept",
        when(col("mix_bucket") < col("keep_threshold"), lit(1))
          .otherwise(lit(0)))
      .select(
        col(idCol), col(shardCol), col("n_source"), col("keep_threshold"),
        col("mix_bucket"), col("kept"))
  }

  /** TOKEN-BUDGET subsampling (how pretraining mixtures are actually
    * specified — "N tokens of source s", not "N documents"): within each
    * source, documents are taken in deterministic md5-hash order until
    * the source's cumulative TOKEN count reaches `budget`; the first doc
    * that would cross the budget is the last kept (budgets cut between
    * docs, so each source lands in [budget, budget + maxDocTokens)).
    * Hash order (not id order) makes the kept set an unbiased sample of
    * the source and redrawable via `salt` — the d12/d22 discipline with
    * a token-denominated quota.
    *
    * ONE window exchange partitioned by source — sources budget in
    * parallel, no global sort; the token count is a stateless projection
    * on the same pass. Output: `doc_id, <shardCol>, n_tokens,
    * cum_tokens (inclusive), kept (0/1)` — kept AND dropped rows ship so
    * the caller can audit the realized budget.
    */
  def tokenBudgetSample(
      docs: DataFrame,
      budget: Long,
      shardCol: String = "source",
      idCol: String = "doc_id",
      salt: String = "tokbudget-v1"): DataFrame = {
    require(budget >= 1, "budget must be >= 1")
    val h = md5(concat_ws(":", lit(salt), col(idCol).cast("string")))
    val w = Window.partitionBy(col(shardCol)).orderBy(col("h").asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(
        col(idCol), col(shardCol),
        TextOps.tokenCount(col("text")).as("n_tokens"), h.as("h"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .select(
        col(idCol), col(shardCol), col("n_tokens"), col("cum_tokens"),
        // kept iff the PREVIOUS cumulative total was still under budget:
        // the boundary-crossing doc is kept, everything after is not
        when(col("cum_tokens") - col("n_tokens") < budget, lit(1))
          .otherwise(lit(0)).as("kept"))
  }

  /** The MATERIALIZED form of [[packSequences]]: each document exploded
    * into its per-sequence pieces — a document whose token stream
    * straddles one or more `budget` boundaries is cut at each, so
    * grouping the output by (shard, seq_id) and concatenating pieces in
    * `seq_offset` order reconstructs every training sequence exactly.
    * This is what a loader consumes directly, vs the bookkeeping row it
    * would otherwise have to derive it from.
    *
    * Same single window exchange as [[packSequences]] (cumulative
    * offsets per shard); the piece cutting itself is
    * [[TextOps.chunkTokens]]'s slice machinery applied per covered
    * sequence — a stateless generator inside the projection, no second
    * shuffle. Output: `doc_id, <shardCol>, seq_id, piece_no (0-based
    * within the doc), piece_start (token index within the doc),
    * piece_len, seq_offset (token index within the sequence),
    * piece_text`.
    */
  def packSequencePieces(
      docs: DataFrame,
      budget: Int,
      shardCol: String = "source",
      idCol: String = "doc_id"): DataFrame = {
    require(budget >= 1, "budget must be >= 1")
    val b = budget.toLong
    val w = Window.partitionBy(col(shardCol)).orderBy(col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pieceStart = greatest(col("seq_id") * b - col("start_offset"), lit(0L))
    val pieceEnd =
      least((col("seq_id") + 1) * b - col("start_offset"), col("n_tokens"))
    docs
      .select(col(idCol), col(shardCol), TextOps.tokens(col("text")).as("tk"))
      .withColumn("n_tokens", size(col("tk")).cast("long"))
      .withColumn("start_offset", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("first_seq", (col("start_offset") / b).cast("long"))
      .withColumn(
        "last_seq",
        ((col("start_offset") + col("n_tokens") - 1) / b).cast("long"))
      .select(
        col(idCol), col(shardCol), col("tk"), col("n_tokens"),
        col("start_offset"), col("first_seq"),
        explode(sequence(col("first_seq"), col("last_seq"))).as("seq_id"))
      .select(
        col(idCol), col(shardCol), col("seq_id"),
        (col("seq_id") - col("first_seq")).as("piece_no"),
        pieceStart.as("piece_start"),
        (pieceEnd - pieceStart).as("piece_len"),
        greatest(col("start_offset") - col("seq_id") * b, lit(0L))
          .as("seq_offset"),
        concat_ws(" ",
          slice(
            col("tk"),
            (pieceStart + 1L).cast("int"),
            (pieceEnd - pieceStart).cast("int"))).as("piece_text"))
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis 2006,
    * the exponential-clock formulation): each row draws a
    * deterministic md5-uniform u ∈ (0, 1] and races with clock
    * −ln(u)/w — the k smallest clocks win, which samples exactly k
    * rows with inclusion probability proportional to weight, without
    * replacement. The md5 draw (not `rand()`) is the d12 discipline:
    * reproducible in DuckDB, across reruns, and under any cluster
    * layout. One stateless scan projection plus a
    * TakeOrderedAndProject k-row heap — no shuffle, no state, the
    * whole corpus is never sorted. The race ranks on the LOG of the
    * clock, rounded to 9 dp: log-domain rounding keeps RELATIVE
    * precision at every weight magnitude (an absolute 9-dp round of
    * the raw clock would collapse all weights ≳ 2e9 to 0.0 and decide
    * among heavy rows by id instead of weight), while still absorbing
    * ln's 1-ulp cross-engine exposure — clock ratios of even 1+1e-8
    * are 10 orders above the round. Ties to the lowest id.
    * Zero/negative weights are excluded up front (their clock is
    * undefined — a weight-0 row must never win).
    *
    * Output: `<idCol>, <weightCol>, log_clock DOUBLE` — the k winners
    * by ascending log clock (ln(−ln u) − ln w).
    */
  def weightedSample(
      df: DataFrame,
      idCol: String,
      weightCol: String,
      k: Int,
      salt: String = "wsample-v1"): DataFrame = {
    require(k >= 1, "k must be >= 1")
    // 15 hex chars → [0, 2^60); (v+1)/(2^60+1) lands strictly inside
    // (0, 1), so both ln's are finite for every draw
    val u = (conv(
      substring(
        md5(concat_ws(":", col(idCol).cast("string"), lit(salt))), 1, 15),
      16, 10).cast("double") + 1.0) / (math.pow(2.0, 60) + 1.0)
    df.filter(col(weightCol) > 0)
      .withColumn(
        "log_clock",
        round(log(-log(u)) - log(col(weightCol).cast("double")), 9))
      .orderBy(asc("log_clock"), asc(idCol))
      .limit(k)
      .select(col(idCol), col(weightCol), col("log_clock"))
  }
}
