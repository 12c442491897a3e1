package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for the training-data-pipeline surface
  * (builder brief: dedup, token counting, quality scoring, language ID,
  * fingerprinting) over a `documents(doc_id, text, lang, source, n_chars)`
  * table.
  *
  * Everything is built from codegen'd `functions._` column expressions —
  * no UDFs — so whole-stage codegen keeps the scans fused and, at 100 TB,
  * each operator is a single pass over the text column with at most one
  * shuffle (the groupBy in dedup).
  */
object TextOps {

  /** Whitespace tokens. `trim` first so leading/trailing blanks don't
    * produce empty tokens (mirrors `\s+` split semantics used by the
    * reference's line parser, GraphBuilderMapper.java:17).
    */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** FEATURE-HASHING text embedding (Weinberger et al.'s hashing trick —
    * the deterministic, model-free embedding a pipeline can compute at
    * ingest): component d of a doc's vector is the signed count of its
    * tokens hashing to d (`H1(t) mod dim` picks the dimension, the
    * second md5 word picks ±1), L2-normalized and rounded at 6 dp. Every
    * arithmetic step is engine-portable: the raw components are exact
    * INTEGER sums (so the norm's Σv² is order-independent in doubles),
    * md5 is the only hash, and the rounding happens after one IEEE
    * division. All-zero vectors (empty text or full sign cancellation)
    * are dropped by contract, mirroring [[Similarity.truncateRenorm]].
    *
    * Scale shape: one explode → one (doc, dim)-keyed map-side-combined
    * hash aggregate → one per-doc gather; dim is a literal, so the dense
    * array builds inside the projection (`try_element_at` over a
    * dim-bounded map — no grid join). Output: `doc_id,
    * embedding ARRAY<DOUBLE>` (unit-norm, rounded).
    */
  def hashEmbed(
      docs: DataFrame, dim: Int = 16, salt: String = "he-v1"): DataFrame = {
    require(dim >= 2, "dim must be >= 2")
    val tok = docs
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"), explode(tokens(col("text"))).as("t"))
    val md = md5(concat_ws(":", lit(salt), col("t")))
    val h1 = conv(substring(md, 1, 8), 16, 10).cast("long")
    val h2 = conv(substring(md, 9, 8), 16, 10).cast("long")
    val sums = tok
      .select(
        col("doc_id"),
        pmod(h1, lit(dim.toLong)).cast("int").as("d"),
        (pmod(h2, lit(2L)) * 2 - 1).as("sgn"))
      .groupBy(col("doc_id"), col("d"))
      .agg(sum(col("sgn")).as("v"))
    val dense = sums
      .groupBy(col("doc_id"))
      .agg(map_from_entries(collect_list(struct(col("d"), col("v"))))
        .as("m"))
      .select(
        col("doc_id"),
        transform(
          sequence(lit(0), lit(dim - 1)),
          i => coalesce(try_element_at(col("m"), i), lit(0L)).cast("double"))
          .as("raw"))
    dense
      .withColumn(
        "nrm", sqrt(aggregate(col("raw"), lit(0.0), (a, x) => a + x * x)))
      .filter(col("nrm") > 0)
      .select(
        col("doc_id"),
        transform(col("raw"), x => round(x / col("nrm"), 6)).as("embedding"))
  }

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE TOKENIZER TRAINING (Sennrich et al.'s byte-pair-encoding merge
    * learner — the op that produces a tokenizer's merge table from a
    * corpus): words become character-symbol sequences; each round counts
    * every adjacent symbol pair (weighted by word frequency), merges the
    * most frequent pair (ties to the lexicographically smallest), and
    * re-tokenizes every word by a LEFT-TO-RIGHT NON-OVERLAPPING replace
    * — "aaa" under merge (a,a) becomes [aa, a], the standard rule.
    * Everything is deterministic, so the whole merge table (and,
    * transitively, every intermediate re-tokenization — round r's counts
    * depend on round r−1's merge) is oracle-recomputable.
    *
    * Scale shape: state is the VOCABULARY (word, count, symbols), not
    * the corpus — one explode + count builds it, each round is one
    * pair-explode + map-side-combined count over vocab-sized rows, one
    * 1-row argmax collect (driver-bounded like every centroid pick),
    * and a stateless in-projection re-tokenize fold; per-round lineage
    * cut by localCheckpoint. k is small by nature of the gate (real
    * tokenizers run ~30k rounds of exactly this loop; the per-round
    * plan is what must be right). Output: `m_rank, m_left, m_right,
    * pair_count` — one row per learned merge.
    */
  def bpeMerges(docs: DataFrame, k: Int): DataFrame = bpeTrain(docs, k)._1

  /** APPLY the trained merges: the corpus SUBWORD FREQUENCY table after
    * encoding with the k merges [[bpeMerges]] learns — the tokenizer-
    * APPLICATION half of the BPE pair (training alone never tokenizes a
    * corpus). Encoding runs on the distinct-WORD table and weights by
    * word frequency — the memoization every real tokenizer applies at
    * corpus scale (encode each distinct word once, words ≪ token
    * occurrences), so the quadratic-ish merge walk prices the
    * vocabulary, not the corpus. Deterministic end-to-end (the d35
    * argmax + left-to-right non-overlap fold), so the oracle unrolls
    * training AND application in the same recursive CTE chain.
    *
    * Output: `subword, cnt` (cnt = Σ over words word_count ×
    * occurrences-in-word after k merges).
    */
  def bpeEncode(docs: DataFrame, k: Int): DataFrame =
    bpeTrain(docs, k)._2
      .select(col("cnt"), explode(col("syms")).as("subword"))
      .groupBy(col("subword"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Shared BPE training loop: returns (merge table, final encoded
    * word table `w, cnt, syms`).
    */
  private def bpeTrain(docs: DataFrame, k: Int): (DataFrame, DataFrame) = {
    require(k >= 1, "k must be >= 1")
    val spark = docs.sparkSession
    val words = docs
      .select(explode(tokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    var syms = words
      .select(col("w"), col("cnt"),
        filter(split(col("w"), ""), x => length(x) > 0).as("syms"))
      .transform(CacheScope.rotate)
    val merges = scala.collection.mutable.ListBuffer[(Int, String, String, Long)]()
    var exhausted = false
    for (rank <- 1 to k if !exhausted) {
      val best = syms
        // single-symbol words have no pairs; without the guard
        // sequence(0, -1) would walk backwards and index 0 under ANSI
        .filter(size(col("syms")) >= 2)
        .select(col("cnt"),
          explode(transform(
            sequence(lit(0), size(col("syms")) - 2),
            i => struct(
              element_at(col("syms"), i + 1).as("lft"),
              element_at(col("syms"), i + 2).as("rgt")))).as("p"))
        .groupBy(col("p.lft").as("lft"), col("p.rgt").as("rgt"))
        .agg(sum(col("cnt")).as("pcnt"))
        .orderBy(desc("pcnt"), asc("lft"), asc("rgt"))
        .limit(1)
        .collect() // 1 row: the argmax, driver-bounded by construction
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, c) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((rank, l, r, c))
        // left-to-right non-overlapping replace as ONE fold inside the
        // projection: state (acc, skip) walks the index sequence — skip
        // marks "position consumed by the previous merge"
        val zero = struct(
          typedLit(Seq.empty[String]).as("acc"), lit(false).as("skip"))
        val folded = aggregate(
          sequence(lit(0), size(col("syms")) - 1),
          zero,
          (st, i) => {
            val acc = st.getField("acc")
            val cur = element_at(col("syms"), i + 1)
            val nxt = try_element_at(col("syms"), i + 2)
            when(st.getField("skip"),
              struct(acc.as("acc"), lit(false).as("skip")))
              .when(
                i < size(col("syms")) - 1 && cur === lit(l) && nxt === lit(r),
                struct(
                  concat(acc, array(lit(l + r))).as("acc"),
                  lit(true).as("skip")))
              .otherwise(
                struct(concat(acc, array(cur)).as("acc"),
                  lit(false).as("skip")))
          },
          st => st.getField("acc"))
        syms = syms
          .select(col("w"), col("cnt"), folded.as("syms"))
          .transform(CacheScope.rotate)
      }
    }
    import spark.implicits._
    (merges.toSeq.toDF("m_rank", "m_left", "m_right", "pair_count"), syms)
  }

  /** BPE-ish subword proxy: alphanumeric runs and single punctuation
    * marks each count as one token (the usual pre-tokenization split a
    * byte-pair encoder starts from). Pure regex — identical semantics in
    * the DuckDB oracle.
    */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z0-9]+|[^a-z0-9\\s]"), lit(0)))
      .cast("long")

  /** Exact dedup groups: one row per distinct text with a deterministic
    * representative (min doc id) and the multiplicity. At scale this is a
    * single hash-aggregate on a 128-bit text digest, not on the full text
    * — group keys stay small no matter how long documents get.
    */
  def exactDedupGroups(docs: DataFrame): DataFrame =
    docs
      .groupBy(md5(col("text")).as("text_md5"))
      .agg(min(col("doc_id")).as("keep_id"), count("*").as("n_copies"))

  /** Exact dedup: keep the minimum doc_id per distinct text. */
  def dedupExact(docs: DataFrame): DataFrame =
    docs.join(
      exactDedupGroups(docs).select(col("keep_id").as("doc_id")),
      Seq("doc_id"),
      "left_semi")

  private val stopwords = Seq("the", "a", "of", "and", "to", "in", "is")

  /** Per-document quality metrics: token count, average token length,
    * stopword ratio, punctuation count, uppercase-start flag. All pure
    * column algebra; deterministic; SQL-expressible for the oracle.
    */
  def qualityMetrics(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val nTok = size(toks).cast("double")
    val stopArr = array(stopwords.map(lit): _*)
    graft.core.Parallelism.ensure(docs).select(
      col("doc_id"),
      col("n_chars"),
      size(toks).cast("long").as("n_tokens"),
      round(
        aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double")
          / nTok,
        6).as("avg_token_len"),
      round(
        size(filter(toks, t => array_contains(stopArr, t))).cast("double")
          / nTok,
        6).as("stopword_ratio"),
      (length(col("text")) -
        length(regexp_replace(col("text"), "[.,!?;:]", "")))
        .cast("long").as("n_punct"))
  }

  /** Language-ID by stopword-hit counting per candidate language: a
    * deterministic n-gram-free heuristic (argmax of per-language stopword
    * hits, ties broken by language code order). Candidate lists are tiny
    * and inlined into the expression — no join, no shuffle.
    */
  val langStops: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein"),
    "en" -> Seq("the", "a", "of", "and", "to", "is", "in"),
    "es" -> Seq("el", "la", "los", "y", "es", "un", "de"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "de"),
    "zh" -> Seq("的", "了", "是", "我", "不", "在", "他"))

  def languageGuess(text: Column): Column = {
    val toks = tokens(lower(text))
    val scored = langStops.map { case (code, words) =>
      val arr = array(words.map(lit): _*)
      (code, size(filter(toks, t => array_contains(arr, t))))
    }
    // argmax with deterministic tie-break on code order (first wins)
    scored.tail.foldLeft((lit(scored.head._1), scored.head._2)) {
      case ((bestCode, bestScore), (code, score)) =>
        (when(score > bestScore, lit(code)).otherwise(bestCode),
          when(score > bestScore, score).otherwise(bestScore))
    }._1
  }

  /** Corpus vocabulary: token → document-frequency and total count,
    * top-K by count. The canonical explode → hash-agg shape: at 100 TB
    * this is one shuffle keyed by token (map-side combined), and the
    * top-K is a bounded heap (`TakeOrderedAndProject`), never a full
    * sort. Ties break lexicographically for cross-engine determinism.
    */
  def vocabulary(docs: DataFrame, topK: Int = 1000): DataFrame =
    graft.core.Parallelism.ensure(docs)
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .groupBy(col("token"))
      .agg(
        count("*").as("n_occurrences"),
        count_distinct(col("doc_id")).as("n_docs"))
      .orderBy(desc("n_occurrences"), asc("token"))
      .limit(topK)

  /** Top-k keywords per document by TF-IDF. Two passes over the exploded
    * token stream — (doc, token) term frequencies, then a join back to
    * the corpus document-frequency table — followed by a per-doc ranked
    * window. At 100 TB both aggregates are map-side-combined hash-aggs
    * keyed by token, and the window partitions by doc_id, which is
    * exactly how the exploded stream is already grouped. The
    * document-frequency side is deliberately NOT hinted broadcast (d17's
    * discipline, plan-asserted): a unigram vocabulary grows sublinearly
    * (Heaps' law) but a web-scale corpus still reaches tens of GB of
    * misspellings/numbers/URLs — statistics and AQE pick broadcast at
    * small scale and a token-keyed shuffle join at large. The corpus
    * doc count rides as an unhinted 1-row frame (provably bounded, the
    * lmScore pattern). Scores rounded for cross-engine determinism;
    * ties break lexicographically.
    */
  def tfidfKeywords(docs: DataFrame, k: Int = 3): DataFrame = {
    val (keywords, tf) = tfidfStages(docs, k)
    CacheScope.sealAfter(keywords, tf)
  }

  /** The pre-seal stages of [[tfidfKeywords]] — exposed so the PlanSpec
    * hint audit can see the join plan before the checkpoint hides it
    * (the d17 pattern). Callers must unpersist the returned `tf`.
    */
  private[graft] def tfidfStages(
      docs: DataFrame, k: Int): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    // one cheap single-column pass for N; the token stream is scanned
    // and exploded exactly ONCE — tf is persisted and df derives from it
    // (each tf row is one distinct (doc, token) pair, so counting rows
    // per token IS the document frequency)
    val nDocs = docs.select(count_distinct(col("doc_id")).as("n_docs"))
    val tf = graft.core.Parallelism.ensure(docs)
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count("*").as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val df = tf.groupBy(col("token")).agg(count("*").as("df"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(desc("tfidf"), asc("token"))
    val keywords = tf.join(df, Seq("token"))
      .crossJoin(nDocs)
      .select(
        col("doc_id"), col("token"),
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6)
          .as("tfidf"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("doc_id"), col("token"), col("tfidf"), col("rn"))
    (keywords, tf)
  }

  /** Composed C4/Gopher-style quality GATE: the keep/drop decision a
    * training-data pipeline actually ships, with the FIRST failing rule
    * as the drop reason (fixed rule order ⇒ deterministic and
    * SQL-recomputable). Rules, in order: minimum token count, mean
    * token length bound (machine-generated/URL soup), minimum stopword
    * ratio (non-prose), punctuation-density bound, duplicate-token
    * ratio bound (boilerplate/repetition). One pure column-algebra pass
    * inside the scan projection — no shuffle, no join, no action
    * (plan-asserted zero-exchange like d21): at 100 TB the gate
    * parallelizes with the input splits and costs one read. Every
    * metric is an integer-ratio double, so both engines compare
    * IDENTICAL values against the thresholds — no float-boundary risk.
    * Output: `doc_id, keep BOOLEAN, reason STRING` ('ok' when kept).
    */
  def filterPipeline(
      docs: DataFrame,
      minTokens: Int = 5,
      maxAvgTokenLen: Double = 12.0,
      minStopwordRatio: Double = 0.01,
      maxPunctRatio: Double = 0.2,
      maxDupTokenRatio: Double = 0.6): DataFrame = {
    val toks = tokens(col("text"))
    val nTok = size(toks).cast("double")
    val stopArr = array(stopwords.map(lit): _*)
    val avgLen =
      aggregate(toks, lit(0L), (a, t) => a + length(t)).cast("double") / nTok
    val stopR =
      size(filter(toks, t => array_contains(stopArr, t))).cast("double") / nTok
    val punctR =
      (length(col("text")) -
        length(regexp_replace(col("text"), "[.,!?;:]", ""))).cast("double") /
        length(col("text")).cast("double")
    val dupR = lit(1.0) - size(array_distinct(toks)).cast("double") / nTok
    val reason = when(size(toks) < minTokens, "too_short")
      .when(avgLen > maxAvgTokenLen, "long_tokens")
      .when(stopR < minStopwordRatio, "low_stopword")
      .when(punctR > maxPunctRatio, "high_punct")
      .when(dupR > maxDupTokenRatio, "repetitive")
      .otherwise("ok")
    graft.core.Parallelism.ensure(docs)
      .select(
        col("doc_id"),
        (reason === "ok").as("keep"),
        reason.as("reason"))
  }

  /** EXACT heavy hitters by two-pass Misra-Gries: every token whose
    * count is ≥ `ceil(frac · N)` (N = total token occurrences), with its
    * exact count — the answer is IDENTICAL to a full `GROUP BY token
    * HAVING count ≥ threshold` (which is what the DuckDB oracle runs),
    * but the engine never materializes a vocabulary-sized aggregation
    * state:
    *
    *   Pass 1 — one scan: a capacity-bounded Misra-Gries summary
    *   ([[graft.functions.MgAggExpr]]) + the exact N in the same
    *   aggregate. With capacity ≥ 2/frac the summary provably contains
    *   EVERY token of frequency ≥ frac·N (undercount ≤ N/(capacity+1) ≤
    *   frac·N/2), under ANY partitioning or merge order — the candidate
    *   set may vary, the no-false-negative guarantee does not.
    *   Pass 2 — one scan: exact counts of the ≤ capacity candidates
    *   (a literal IN filter, pushable to the scan) and the threshold
    *   cut, which removes every false positive.
    *
    * So a partitioning-dependent sketch still yields a deterministic,
    * hash-checkable result. The driver holds only the candidate array
    * (≤ capacity strings) and N — bounded regardless of corpus size.
    * At 100 TB the exchange in pass 1 carries ≤ capacity counters per
    * map task where the exact groupBy ships every distinct token.
    */
  def heavyHitters(docs: DataFrame, frac: Double = 0.01): DataFrame = {
    require(frac > 0 && frac < 1, "frac must be in (0, 1)")
    val capacity = math.max(math.ceil(2.0 / frac).toInt, 8)
    def tok = graft.core.Parallelism.ensure(docs)
      .select(explode(tokens(col("text"))).as("token"))
    val row = tok.agg(
      graft.functions.VectorFunctions
        .mgCandidates(col("token"), capacity).as("cand"),
      count("*").as("n")).collect()(0)
    val cand = row.getSeq[String](0)
    val n = row.getLong(1)
    val thresh = math.ceil(frac * n).toLong
    tok
      .filter(col("token").isin(cand: _*))
      .groupBy(col("token"))
      .agg(count("*").as("cnt"))
      .filter(col("cnt") >= thresh)
  }

  /** Character-entropy quality signal: Shannon entropy (nats) of the
    * per-document character distribution — near-zero for repetitive
    * filler, anomalously high for random gibberish; the CCNet-family
    * pipelines threshold on exactly this class of signal. Computed
    * per-row with NO shuffle: the character list, its distinct set, and
    * the Σ -p·ln(p) fold all live inside the scan projection (distinct
    * alphabet ≈ dozens, so the O(len·|alphabet|) per-row cost is trivial
    * and the 100 TB cost is one read). Probabilities are integer-ratio
    * doubles (identical in both engines); the entropy is rounded to 6 dp
    * so last-ulp `ln` differences between libm implementations cannot
    * leak into the hash. Output: `doc_id, n_chars_total, alphabet_size,
    * char_entropy`.
    */
  def charEntropy(docs: DataFrame): DataFrame = {
    val chars = split(col("text"), "")
    val n = size(chars).cast("double")
    val uniq = array_distinct(chars)
    // fold over the SORTED alphabet: both engines then sum the -p·ln(p)
    // terms in the identical order, so the pre-rounding doubles agree to
    // the last bit modulo libm ulps (absorbed by the 6 dp rounding)
    val ent = aggregate(
      array_sort(uniq),
      lit(0.0),
      (acc, ch) => {
        val p = size(filter(chars, c => c === ch)).cast("double") / n
        acc - p * log(p)
      })
    graft.core.Parallelism.ensure(docs)
      .select(
        col("doc_id"),
        size(chars).cast("long").as("n_chars_total"),
        size(uniq).cast("long").as("alphabet_size"),
        round(ent, 6).as("char_entropy"))
  }

  /** Vocabulary coverage curve: the top-`topK` tokens by corpus count
    * with each token's share and the CUMULATIVE share of all token
    * occurrences — the statistic a tokenizer/vocab-size decision reads
    * ("the top 1k tokens cover X% of the stream; everything else is
    * OOV"). One explode → token-keyed map-side-combined hash-agg (the
    * d10 shape), a bounded top-K, and a window cumsum over only topK
    * rows — the full-corpus total rides as an unhinted 1-row frame.
    * Shares are rounded; ranks tie-break lexicographically.
    * Output: `rank, token, n_occurrences, share, cum_share`.
    */
  def vocabCoverage(docs: DataFrame, topK: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = graft.core.Parallelism.ensure(docs)
      .select(explode(tokens(col("text"))).as("token"))
    val counts = tok.groupBy(col("token")).agg(count("*").as("n_occurrences"))
    val total = counts.agg(sum(col("n_occurrences")).as("total"))
    val w = Window.orderBy(desc("n_occurrences"), asc("token"))
    counts
      .orderBy(desc("n_occurrences"), asc("token"))
      .limit(topK)
      .crossJoin(total)
      .withColumn("rank", row_number().over(w))
      .withColumn(
        "cum",
        sum(col("n_occurrences")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(
        col("rank").cast("long").as("rank"),
        col("token"),
        col("n_occurrences"),
        round(col("n_occurrences").cast("double") / col("total"), 9)
          .as("share"),
        round(col("cum").cast("double") / col("total"), 9).as("cum_share"))
  }

  /** Repetition quality signal: fraction of duplicate word n-grams per
    * document (Gopher-style "repeated n-gram" filter — heavily repetitive
    * boilerplate scores high and gets culled before training). Pure
    * single-pass column algebra: the n-gram list is built per row inside
    * the scan projection, so at 100 TB this is one pass over the text
    * column with no shuffle at all. Documents with fewer than `n` tokens
    * have no n-grams: ratio 0 by definition.
    */
  def repeatedNgramStats(docs: DataFrame, n: Int = 3): DataFrame = {
    val toks = tokens(col("text"))
    val nGrams = size(toks) - lit(n - 1)
    val grams = transform(
      sequence(lit(0), greatest(nGrams, lit(1)) - 1),
      i => concat_ws(" ", slice(toks, i + 1, lit(n))))
    graft.core.Parallelism.ensure(docs).select(
      col("doc_id"),
      greatest(nGrams, lit(0)).cast("long").as("n_ngrams"),
      when(nGrams >= 1, size(array_distinct(grams)))
        .otherwise(lit(0)).cast("long").as("n_distinct"),
      when(
        nGrams >= 1,
        round(
          lit(1.0) -
            size(array_distinct(grams)).cast("double") /
            nGrams.cast("double"),
          6))
        .otherwise(lit(0.0)).as("rep_ratio"))
  }

  /** Overlapping token-window chunking (the RAG / training-prep step
    * that turns documents into model-sized pieces): chunk `c` covers
    * tokens `[c·stride, c·stride + chunkSize)`, so consecutive chunks
    * overlap by `chunkSize − stride` tokens and every token is covered.
    * One generator per doc built inside the scan projection (sequence →
    * explode → slice): a stateless flatMap with NO shuffle — at 100 TB
    * the chunker is a pure map stage that parallelizes with the input
    * splits, which is the whole design. Empty/blank docs yield no
    * chunks. Output: `doc_id, chunk_id, chunk_text, n_chunk_tokens`.
    */
  def chunkTokens(
      docs: DataFrame, chunkSize: Int = 32, stride: Int = 16): DataFrame = {
    require(stride >= 1 && chunkSize >= stride,
      "need stride >= 1 and chunkSize >= stride")
    val toks = tokens(col("text"))
    // last chunk start = the largest multiple of stride < n_tokens
    val lastStart = floor((size(toks) - 1).cast("double") / stride).cast("int")
    graft.core.Parallelism.ensure(docs)
      .filter(length(trim(col("text"))) > 0)
      .select(
        col("doc_id"),
        toks.as("tk"),
        explode(sequence(lit(0), lastStart)).as("c"))
      .select(
        col("doc_id"),
        col("c").cast("long").as("chunk_id"),
        concat_ws(" ", slice(col("tk"), col("c") * stride + 1, lit(chunkSize)))
          .as("chunk_text"),
        size(slice(col("tk"), col("c") * stride + 1, lit(chunkSize)))
          .cast("long").as("n_chunk_tokens"))
  }

  /** STRUCTURE-AWARE chunking (the chunker RAG pipelines actually
    * deploy, [[chunkTokens]]' boundary-respecting twin): text splits
    * into SEGMENTS at separator boundaries (default: sentence-ending
    * punctuation + whitespace — a character class both Java regex and
    * RE2 read identically, the d38 portability rule) and consecutive
    * segments pack into chunks of ≈ `budget` tokens, cutting ONLY at
    * segment boundaries. A segment starts the chunk its cumulative
    * token offset falls into (`floor(cum_before/budget)` — the d19/d20
    * budget-cut rule, which keeps assignment a pure window expression
    * instead of a sequential fold), so a single segment longer than
    * the budget owns its chunk whole — never split mid-sentence. Each
    * chunk after the first is prefixed with the PREVIOUS chunk's last
    * segment (1-segment overlap, the context-stitching RAG retrievers
    * rely on) — "previous" by chunk ORDER, not by id−1: an oversized
    * segment makes chunk ids skip integers (`floor(cum/budget)` jumps),
    * and the chunk after the gap still gets its predecessor's tail.
    *
    * Scale shape: one posexplode of the segment stream, ONE window per
    * document (cumulative token offsets — documents chunk in
    * parallel, the d19 argument), one (doc, chunk) hash aggregate, and
    * a chunk-count-sized lag window for the overlap prefix. Output:
    * `doc_id, chunk_id, n_segments, n_tokens, chunk_text` (n_* count
    * the chunk's OWN segments, excluding the overlap prefix).
    */
  def chunkStructured(
      docs: DataFrame,
      sepRegex: String = "[.!?]\\s+",
      budget: Int = 48): DataFrame = {
    require(budget >= 1, "budget must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id")).orderBy(col("seg_idx"))
    val segs = graft.core.Parallelism.ensure(docs)
      .filter(length(trim(col("text"))) > 0)
      .select(
        col("doc_id"),
        posexplode(split(trim(col("text")), sepRegex))
          .as(Seq("seg_idx", "seg")))
      .filter(length(trim(col("seg"))) > 0)
      .select(
        col("doc_id"), col("seg_idx").cast("long").as("seg_idx"),
        trim(col("seg")).as("seg"))
      .withColumn("t", size(split(col("seg"), "\\s+")).cast("long"))
    val assigned = segs
      .withColumn(
        "cum_before",
        coalesce(
          sum(col("t")).over(w.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .withColumn(
        "chunk_id", floor(col("cum_before") / budget).cast("long"))
    val chunks = assigned
      .groupBy(col("doc_id"), col("chunk_id"))
      .agg(
        count(lit(1)).as("n_segments"),
        sum(col("t")).as("n_tokens"),
        concat_ws(" ",
          transform(
            array_sort(collect_list(struct(col("seg_idx"), col("seg")))),
            s => s.getField("seg"))).as("body"),
        max_by(col("seg"), col("seg_idx")).as("last_seg"))
    // overlap = the PRECEDING chunk's tail by chunk order (lag, not an
    // id−1 self-join): oversized segments make chunk ids skip integers,
    // and the chunk after the gap must still get its predecessor's tail
    val wc = Window.partitionBy(col("doc_id")).orderBy(col("chunk_id"))
    chunks
      .withColumn("overlap_seg", lag(col("last_seg"), 1).over(wc))
      .select(
        col("doc_id"), col("chunk_id"), col("n_segments"), col("n_tokens"),
        when(col("overlap_seg").isNotNull,
          concat(col("overlap_seg"), lit(" "), col("body")))
          .otherwise(col("body")).as("chunk_text"))
  }

  /** Cross-document boilerplate ratio (the CCNet/C4-style corpus-level
    * repetition filter, complementing [[repeatedNgramStats]]'s
    * within-document signal): an n-gram is "boilerplate" when it occurs
    * in ≥ `minDf` distinct documents; each document reports how much of
    * it is made of such shared n-grams, and `keep = 0` culls documents
    * past `maxRatio`. Two map-side-combined hash-aggregates over ONE
    * exploded distinct-n-gram stream (df keyed by a 128-bit digest, not
    * the raw text, so group keys stay bounded) + a join back on the
    * digest key. The boiler side is deliberately NOT hinted broadcast:
    * unlike a unigram vocabulary, the distinct-3-gram set above `minDf`
    * grows roughly linearly with corpus size, so at 100 TB it is nowhere
    * near driver-sized — size statistics / AQE pick the join strategy
    * (broadcast at small scale, a digest-keyed shuffle join at large,
    * where the agg output is already hash-partitioned by `g` so only the
    * pairs side exchanges). Contrast [[graft.operators.Dedup.decontaminate]],
    * whose broadcast side IS bounded by the nature of an eval set.
    * Output: `doc_id, n_grams, n_boiler, boiler_ratio, keep`.
    */
  def boilerplateStats(
      docs: DataFrame,
      n: Int = 3,
      minDf: Int = 5,
      maxRatio: Double = 0.5): DataFrame = {
    val (perDoc, pairs) = boilerplateStages(docs, n, minDf, maxRatio)
    CacheScope.sealAfter(perDoc, pairs)
  }

  /** The unsealed plan behind [[boilerplateStats]], exposed so the plan
    * audit can assert join strategy is statistics-driven (no hint).
    * Returns (result, the persisted pair stream to unpersist).
    */
  private[graft] def boilerplateStages(
      docs: DataFrame,
      n: Int,
      minDf: Int,
      maxRatio: Double): (DataFrame, DataFrame) = {
    val toks = tokens(col("text"))
    val nGrams = greatest(size(toks) - lit(n - 1), lit(1))
    val grams = array_distinct(
      transform(
        sequence(lit(0), nGrams - 1),
        i => md5(concat_ws(" ", slice(toks, i + 1, lit(n))))))
    // one distinct (doc, gram-digest) stream feeds BOTH the per-doc
    // totals and the corpus df
    val pairs = graft.core.Parallelism.ensure(docs)
      .select(col("doc_id"), explode(grams).as("g"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val boiler = pairs.groupBy(col("g")).agg(count("*").as("df"))
      .filter(col("df") >= minDf)
      .select(col("g"), lit(1).as("is_boiler"))
    val perDoc = pairs
      .join(boiler, Seq("g"), "left_outer")
      .groupBy(col("doc_id"))
      .agg(
        count("*").as("n_grams"),
        sum(coalesce(col("is_boiler"), lit(0))).cast("long").as("n_boiler"))
      .select(
        col("doc_id"), col("n_grams"), col("n_boiler"),
        round(col("n_boiler").cast("double") / col("n_grams"), 6)
          .as("boiler_ratio"),
        when(col("n_boiler").cast("double") / col("n_grams") <= maxRatio,
          lit(1)).otherwise(lit(0)).as("keep"))
    (perDoc, pairs)
  }

  /** Model-based quality scoring via a corpus-trained bigram language
    * model (the statistical stand-in for the perplexity filters LLM
    * pipelines run with a small LM): every document is scored by the
    * mean add-one-smoothed conditional log-probability of its adjacent
    * token pairs, `ln((c(t1,t2)+1) / (c(t1)+V))`, with counts and the
    * vocabulary size V trained on the full corpus token stream itself.
    * Low scores mark gibberish/rare-junk text, high scores natural
    * prose — the same ranking a KenLM-style filter produces, but fully
    * recomputable by the SQL oracle.
    *
    * Scale shape (100 TB): two map-side-combined hash-aggregates (the
    * unigram and bigram count tables) plus two joins KEYED ON GRAMS —
    * the bigram-count join output is already hash-partitioned by
    * (t1, t2) from its aggregation, so only the pair stream exchanges;
    * neither count table is hinted broadcast (the bigram table grows
    * with the corpus — same statistics-driven discipline as
    * [[boilerplateStats]]). V rides along as a 1-row frame through a
    * broadcast nested-loop join, never a collected literal. Documents
    * with fewer than two tokens have no bigrams and are absent from the
    * output. Output: `doc_id, n_bigrams, lm_score`.
    */
  def lmScore(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val d = graft.core.Parallelism.ensure(docs)
    // the corpus token stream: unigram counts + vocabulary size
    val tok = d.select(explode(toks).as("t"))
    val uni = tok.groupBy(col("t")).agg(count("*").as("cu"))
    val vv = tok.agg(count_distinct(col("t")).cast("double").as("v"))
    // adjacent-pair stream, built inside the scan projection
    val pairArr = transform(
      sequence(lit(0), size(toks) - lit(2)),
      i => slice(toks, i + 1, lit(2)))
    // one persisted pair stream feeds BOTH the bigram counts and the
    // scoring join — the text column is exploded exactly once
    val pairs = d
      .filter(size(toks) >= 2)
      .select(col("doc_id"), explode(pairArr).as("pr"))
      .select(
        col("doc_id"),
        element_at(col("pr"), 1).as("t1"),
        element_at(col("pr"), 2).as("t2"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bi = pairs.groupBy(col("t1"), col("t2")).agg(count("*").as("cb"))
    val scored = pairs
      .join(bi, Seq("t1", "t2"))
      .join(uni.withColumnRenamed("t", "t1"), Seq("t1"))
      .crossJoin(vv)
      .select(
        col("doc_id"),
        log((col("cb") + lit(1)).cast("double") /
          (col("cu").cast("double") + col("v"))).as("lp"))
      .groupBy(col("doc_id"))
      .agg(
        count("*").as("n_bigrams"),
        round(avg(col("lp")), 6).as("lm_score"))
    CacheScope.sealAfter(scored, pairs)
  }

  /** Corpus COLLOCATIONS by pointwise mutual information: the top-`topN`
    * adjacent token pairs by PMI = ln((c_xy/B) / ((c_x/N)·(c_y/N)))
    * with a `minCount` support floor (raw PMI without a floor surfaces
    * hapax noise — the standard Church–Hanks discipline). The
    * vocabulary-analysis twin of d23's bigram LM: same one-explode pair
    * stream, two hash-aggregated count tables joined on their gram keys
    * with NO broadcast hints (both grow with the corpus — the d17
    * discipline), N and B riding as 1-row frames. The top-N boundary
    * ranks on (rounded PMI desc, t1, t2) so float noise cannot reorder
    * it. Output: `t1, t2, n_pair, pmi`.
    */
  def collocations(
      docs: DataFrame, minCount: Long = 5, topN: Int = 20): DataFrame = {
    val toks = tokens(col("text"))
    val d = graft.core.Parallelism.ensure(docs)
    val tok = d.select(explode(toks).as("t"))
    val uni = tok.groupBy(col("t")).agg(count("*").as("cu"))
    val nn = tok.agg(count("*").cast("double").as("n"))
    val pairArr = transform(
      sequence(lit(0), size(toks) - lit(2)),
      i => slice(toks, i + 1, lit(2)))
    val pairs = d
      .filter(size(toks) >= 2)
      .select(explode(pairArr).as("pr"))
      .select(
        element_at(col("pr"), 1).as("t1"),
        element_at(col("pr"), 2).as("t2"))
    val bi = pairs.groupBy(col("t1"), col("t2")).agg(count("*").as("cb"))
    val bb = pairs.agg(count("*").cast("double").as("b"))
    bi.filter(col("cb") >= minCount)
      .join(uni.select(col("t").as("t1"), col("cu").as("c1")), Seq("t1"))
      .join(uni.select(col("t").as("t2"), col("cu").as("c2")), Seq("t2"))
      .crossJoin(nn)
      .crossJoin(bb)
      .select(
        col("t1"), col("t2"), col("cb").as("n_pair"),
        round(
          log((col("cb").cast("double") / col("b")) /
            ((col("c1").cast("double") / col("n")) *
              (col("c2").cast("double") / col("n")))),
          6).as("pmi"))
      .orderBy(desc("pmi"), asc("t1"), asc("t2"))
      .limit(topN)
  }

  /** Document fingerprint over word 3-shingles: the minimum shingle
    * digest is a 1-permutation MinHash, `doc_hash` identifies the exact
    * normalized content. Digests are md5 (hex strings) rather than
    * xxhash64: same single-pass plan and ordering semantics
    * (lexicographic min over hex = min over the 128-bit value), but
    * reproducible in any engine — this is what makes the operator
    * oracle-checkable end-to-end. Pipelines that only need engine-local
    * fingerprints can swap in xxhash64 (as [[graft.operators.Dedup]]
    * does for LSH) for cheaper hashing; the contract is unchanged.
    */
  def fingerprint(docs: DataFrame, shingle: Int = 3): DataFrame = {
    val toks = tokens(col("text"))
    val nSh = greatest(size(toks) - lit(shingle - 1), lit(1))
    val shingles = transform(
      sequence(lit(0), nSh - 1),
      i => md5(concat_ws(" ", slice(toks, i + 1, lit(shingle)))))
    graft.core.Parallelism.ensure(docs).select(
      col("doc_id"),
      array_min(shingles).as("min_shingle_hash"),
      md5(concat_ws(" ", toks)).as("doc_hash"))
  }
  /** PII REDACTION (the scrubbing pass every training-data pipeline
    * runs before text leaves the lake): emails, dotted-quad IPs, and
    * international-format phone numbers replaced by placeholder tokens,
    * with per-document match counts so governance can audit what was
    * removed. Patterns are restricted to the regex subset whose
    * semantics agree between Java's engine and RE2 (character classes,
    * bounded quantifiers, no alternation ambiguity, no backreferences)
    * — which is what lets a DuckDB oracle recompute every redacted
    * string byte for byte. Replacement order is FIXED (email → ip →
    * phone) and counts are taken on the ORIGINAL text, so the output
    * is well-defined regardless of pattern overlap.
    *
    * Scale shape: a stateless scan projection — three codegen'd
    * regexp_count + three chained regexp_replace, zero exchanges, zero
    * joins (the d24/d26 plan discipline, asserted in PlanSpec).
    */
  val PiiEmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PiiIpRe = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
  val PiiPhoneRe = "\\+[0-9][0-9 ]{5,14}[0-9]"

  def redactPii(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(
      col("doc_id"),
      regexp_count(col(textCol), lit(PiiEmailRe)).cast("long").as("n_emails"),
      regexp_count(col(textCol), lit(PiiIpRe)).cast("long").as("n_ips"),
      regexp_count(col(textCol), lit(PiiPhoneRe)).cast("long")
        .as("n_phones"),
      regexp_replace(
        regexp_replace(
          regexp_replace(col(textCol), lit(PiiEmailRe), lit("<EMAIL>")),
          lit(PiiIpRe), lit("<IP>")),
        lit(PiiPhoneRe), lit("<PHONE>")).as("redacted"))

  /** BM25 ranked retrieval (Robertson–Spärck Jones, the Okapi
    * formulation with the +1-inside-ln idf that keeps scores
    * non-negative) for a FIXED bag of query terms — the retrieval
    * scorer a RAG/decontamination pipeline runs next to its embedding
    * index (p4's lexical twin). One exploded-token pass builds the
    * (doc, term) tf for the query terms only (the isin filter runs
    * INSIDE the scan projection, so the exploded stream is
    * |terms|-bounded before it ever shuffles); doc length comes from
    * the same projection pre-filter; df and avgdl ride group-keyed
    * aggregates of those. The |terms|-row df frame and the 1-row avgdl
    * frame join back statistics-broadcast (hint-free, the d17
    * discipline). Per-term contributions round to 6 dp BEFORE the
    * per-doc sum so the cross-engine fold order cannot move a 6-dp
    * boundary, then the top-k cut ranks on (rounded score, doc_id).
    *
    * Output: `doc_id, score DOUBLE` — top `k` docs for the query.
    */
  def bm25TopK(
      docs: DataFrame,
      queryTerms: Seq[String],
      k: Int = 20,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    val (ranked, base) = bm25Stages(docs, queryTerms, k, k1, b)
    CacheScope.sealAfter(ranked, base)
  }

  /** The pre-seal stages of [[bm25TopK]] — exposed so the PlanSpec
    * audit can see the join plan and the TakeOrderedAndProject before
    * the checkpoint hides them (the tfidfStages pattern). Callers must
    * unpersist the returned `base`.
    */
  private[graft] def bm25Stages(
      docs: DataFrame,
      queryTerms: Seq[String],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75): (DataFrame, DataFrame) = {
    require(queryTerms.nonEmpty && k >= 1, "need query terms and k >= 1")
    val toks = tokens(col("text"))
    // persisted: BOTH the corpus stats and the tf branch read this
    // frame — without the barrier each would re-scan and re-tokenize
    // the corpus (the lshPairsCore materialization discipline)
    val base = docs.select(
        col("doc_id"),
        size(toks).cast("double").as("dl"),
        filter(toks, t => t.isin(queryTerms: _*)).as("qtoks"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val stats = base.agg(
      count(lit(1)).cast("double").as("n_docs"),
      avg(col("dl")).as("avgdl"))
    val tf = base
      .select(col("doc_id"), col("dl"), explode(col("qtoks")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"), first(col("dl")).as("dl"))
    val df = tf.groupBy(col("term"))
      .agg(count(lit(1)).cast("double").as("df"))
    val contrib = tf.join(df, Seq("term")).crossJoin(stats)
      .select(
        col("doc_id"),
        round(
          log(lit(1.0)
            + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
            * col("tf") * (lit(k1) + 1.0)
            / (col("tf")
              + lit(k1) * (lit(1.0 - b)
                + lit(b) * col("dl") / col("avgdl"))),
          6).as("c"))
    // global top-k plans as TakeOrderedAndProject: a bounded heap per
    // partition + one k-row merge on the driver, never a full sort
    val ranked = contrib.groupBy(col("doc_id"))
      .agg(round(sum(col("c")), 6).as("score"))
      .orderBy(desc("score"), asc("doc_id"))
      .limit(k)
    (ranked, base)
  }

  /** χ² feature selection: the chi-squared association of each token's
    * document-level PRESENCE with a boolean document label — the
    * classic supervised vocabulary filter (select the k tokens most
    * predictive of quality/language/domain). All four contingency
    * cells derive from ONE distinct-(doc, token) aggregate plus the
    * label totals (a 1-row frame); the statistic is pure integer
    * arithmetic until the final division, so both engines compute
    * IDENTICAL doubles. Tokens present in every document (a zero
    * margin) drop out — χ² is undefined there and carries no signal.
    * Output: top `k` by (χ² desc, token asc): `token, chi2, df`.
    */
  def chi2Terms(
      docs: DataFrame, label: Column, k: Int = 20): DataFrame = {
    val present = docs
      .select(
        col("doc_id"), label.cast("boolean").as("y"),
        explode(array_distinct(tokens(col("text")))).as("token"))
    val cells = present
      .groupBy(col("token"))
      .agg(
        sum(col("y").cast("long")).as("a"),       // token & label
        sum((!col("y")).cast("long")).as("b"))    // token & !label
    val totals = docs.agg(
      sum(label.cast("long")).as("tp"),
      sum((!label).cast("long")).as("tq"))
    cells.crossJoin(totals)
      .select(
        col("token"), col("a"), col("b"),
        (col("tp") - col("a")).as("c"),
        (col("tq") - col("b")).as("d"),
        (col("tp") + col("tq")).as("n"))
      .filter(
        (col("a") + col("b")) > 0 && (col("c") + col("d")) > 0
          && (col("a") + col("c")) > 0 && (col("b") + col("d")) > 0)
      .select(
        col("token"),
        // every cell cast to double BEFORE the products: long·long
        // would overflow at web-scale counts, and doubles keep the
        // cells exact to 2^53 — identical in both engines
        round(
          col("n").cast("double")
            * pow(
              col("a").cast("double") * col("d").cast("double")
                - col("b").cast("double") * col("c").cast("double"), 2)
            / ((col("a") + col("b")).cast("double")
              * (col("c") + col("d")).cast("double")
              * (col("a") + col("c")).cast("double")
              * (col("b") + col("d")).cast("double")),
          6).as("chi2"),
        (col("a") + col("b")).as("df"))
      .orderBy(desc("chi2"), asc("token"))
      .limit(k)
  }

  /** Inverted-index build: token → sorted posting list of the docs
    * containing it, plus df — the artifact d41's BM25 (or any lexical
    * search) serves from. One exploded distinct-(doc, token) pass into
    * a token-keyed hash aggregate; postings serialize as a
    * comma-joined string (a stable, engine-portable encoding — sorted
    * doc order is part of the index contract). At 100 TB the aggregate
    * is map-side combined per token; a stop-word-grade token with a
    * corpus-sized posting list is the one skew risk, which is why the
    * `minDf`/`maxDfRatio` gates exist — real indexes drop those terms
    * anyway (they carry no selectivity).
    *
    * Output: `token, df LONG, postings STRING`.
    */
  def invertedIndex(
      docs: DataFrame,
      minDf: Int = 1,
      maxDfRatio: Double = 1.0): DataFrame = {
    val nDocs = docs.agg(
      count_distinct(col("doc_id")).cast("double").as("n_docs"))
    docs
      .select(
        col("doc_id"),
        explode(array_distinct(tokens(col("text")))).as("token"))
      .groupBy(col("token"))
      .agg(
        count(lit(1)).as("df"),
        array_join(sort_array(collect_list(col("doc_id"))), ",")
          .as("postings"))
      .crossJoin(nDocs)
      .filter(
        col("df") >= minDf
          && col("df").cast("double") <= col("n_docs") * maxDfRatio)
      .select(col("token"), col("df"), col("postings"))
  }

  /** Word CO-OCCURRENCE graph (the TextRank construction, Mihalcea &
    * Tarau 2004): an undirected weighted edge per ordered token pair at
    * distance ≤ `window` inside a document, weight = corpus-wide count.
    * Pair generation is a STATELESS projection — `transform` over the
    * token array with `try_element_at` neighbor lookups, no positional
    * self-join — so at 100 TB the only shuffle is the final
    * map-side-combined edge aggregate (vocabulary-sized, tiny next to
    * the corpus). Self-pairs dropped; both directions emitted so the
    * downstream weighted PageRank sees a symmetric graph. Output:
    * `src STRING, dst STRING, w DOUBLE`.
    */
  def cooccurrenceEdges(docs: DataFrame, window: Int = 2): DataFrame = {
    require(window >= 1, "window must be >= 1")
    val tk = tokens(col("text"))
    val offs = (1 to window).map { d =>
      docs.select(explode(transform(tk, (x, i) =>
        struct(
          x.as("u"),
          try_element_at(tk, i + lit(d + 1)).as("v")))).as("p"))
        .select(col("p.u").as("src"), col("p.v").as("dst"))
    }
    val pairs = offs.reduce(_ unionAll _)
      .filter(col("dst").isNotNull && col("src") =!= col("dst"))
    pairs.unionAll(pairs.select(col("dst").as("src"), col("src").as("dst")))
      .groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).cast("double").as("w"))
  }

  /** URL CANONICALIZATION — the normalization every web-crawl pipeline
    * runs before URL-level dedup (CommonCrawl/CCNet discipline: the
    * same page arrives under scheme-case, host-case, default-port,
    * trailing-slash, tracking-parameter and fragment variants, and a
    * byte-equality dedup misses all of them). Pure codegen'd string
    * algebra on a single projection — no UDF, no shuffle:
    *
    *  1. fragment stripped (`#…` never reaches the server);
    *  2. scheme and host lowercased (RFC 3986 §6.2.2.1);
    *  3. default port dropped (`:443` for https, `:80` for http);
    *  4. trailing path slash stripped (root `/` kept);
    *  5. query parameters split, tracking params removed
    *     (`utm_*`, `ref`, `fbclid`, `gclid` — the standard strip list),
    *     survivors SORTED and rejoined (param order is not semantic).
    *
    * Output: input columns + `canonical_url`. Downstream URL-level
    * dedup is then an exact hash-aggregate on the canonical form —
    * the cheapest dedup granularity at 100 TB (no content read).
    */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostPort = lower(regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?]+)", 1))
    val host = when(
      scheme === "https" && hostPort.endsWith(":443"),
      regexp_replace(hostPort, ":443$", ""))
      .when(
        scheme === "http" && hostPort.endsWith(":80"),
        regexp_replace(hostPort, ":80$", ""))
      .otherwise(hostPort)
    val rawPath = regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?]+([^?]*)", 1)
    val path = when(
      length(rawPath) > 1 && rawPath.endsWith("/"),
      regexp_replace(rawPath, "/$", ""))
      .otherwise(rawPath)
    val rawQuery = when(noFrag.contains("?"),
      regexp_extract(noFrag, "\\?(.*)$", 1)).otherwise(lit(""))
    val keptParams = filter(
      split(rawQuery, "&"),
      p => !(p.startsWith("utm_") || p.startsWith("ref=") ||
        p.startsWith("fbclid=") || p.startsWith("gclid=") || p === ""))
    val query = array_join(array_sort(keptParams), "&")
    concat(
      scheme, lit("://"), host, path,
      when(length(query) > 0, concat(lit("?"), query)).otherwise(lit("")))
  }

  /** URL-level exact dedup over canonical forms: one hash aggregate
    * keyed by [[canonicalizeUrl]] output — per canonical URL, the
    * duplicate count and the kept (minimum) document id, plus the host
    * for downstream per-site stats. Map-side combined; the only
    * shuffle is the dedup key exchange.
    */
  def urlDedup(docs: DataFrame, urlCol: String = "url"): DataFrame =
    docs
      .select(
        col("doc_id"),
        canonicalizeUrl(col(urlCol)).as("canonical_url"))
      .withColumn(
        "host",
        regexp_extract(col("canonical_url"), "^[a-z][a-z0-9+.-]*://([^/?]+)", 1))
      .groupBy(col("canonical_url"), col("host"))
      .agg(
        count(lit(1)).as("n_dups"),
        min(col("doc_id")).as("keep_doc_id"))
}
