package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection for the training-data-pipeline surface:
  * MinHash+LSH, SimHash, and n-gram Jaccard over `documents`.
  *
  * Design for 100 TB: nothing here ever forms the |D|² cross product.
  * MinHash/LSH shuffles (band_no, band_hash) keys — candidate pairs are
  * Σ|bucket|², bounded by band tuning; SimHash is a single pass emitting
  * one 64-bit signature per doc; exact Jaccard verification runs only on
  * LSH survivors. All hashing is xxhash64-based column algebra —
  * deterministic across runs/partitionings, no UDFs.
  */
object Dedup {

  /** Word n-gram (shingle) hash array, distinct, per document. */
  def shingleHashes(text: Column, n: Int): Column = {
    val toks = TextOps.tokens(text)
    val nSh = greatest(size(toks) - lit(n - 1), lit(1))
    array_distinct(
      transform(
        sequence(lit(0), nSh - 1),
        i => xxhash64(concat_ws(" ", slice(toks, i + 1, lit(n))))))
  }

  /** k-permutation MinHash signature from an ALREADY-MATERIALIZED shingle
    * hash array column: h_i(S) = min_{s∈S} xxhash64(i, s).
    *
    * The shingle array must be a bound column, not an inline expression:
    * higher-order functions are interpreted (not codegen'd), and an
    * inlined shingle expression would be re-evaluated once per
    * permutation — measured 50× slower at sf0.1.
    */
  def minhashSigFromShingles(sh: Column, k: Int): Column =
    transform(
      sequence(lit(0), lit(k - 1)),
      i => array_min(transform(sh, s => xxhash64(i, s))))

  /** `doc_id, sig ARRAY<LONG>` — two projections so Catalyst binds the
    * shingle array once (CollapseProject keeps them separate because the
    * reference is expensive and used k times).
    */
  def minhashSignatures(docs: DataFrame, k: Int, shingle: Int = 3): DataFrame =
    docs
      .select(col("doc_id"), shingleHashes(col("text"), shingle).as("sh"))
      .select(col("doc_id"), minhashSigFromShingles(col("sh"), k).as("sig"))

  /** LSH candidate pairs: signatures split into `bands` bands of
    * k/bands rows; docs sharing any full band land in a bucket; pairs
    * are generated within buckets only (shuffle key = band_no ⊕ band
    * content hash, never the cross product).
    */
  def lshCandidatePairs(
      docs: DataFrame,
      k: Int = 32,
      bands: Int = 8,
      shingle: Int = 3): DataFrame = {
    val rows = k / bands
    // persist the signature matrix: it is THE materialization point of an
    // LSH pipeline (|D|·k longs). Without the barrier, Catalyst inlines
    // the whole minhash computation into the band-explode generator AND
    // into both sides of the bucket self-join — measured 100× slower.
    val sigs = minhashSignatures(docs, k, shingle)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = sigs.select(
      col("doc_id"),
      explode(
        transform(
          sequence(lit(0), lit(bands - 1)),
          b => struct(
            b.as("band_no"),
            xxhash64(slice(col("sig"), b * rows + 1, lit(rows)).cast("string"))
              .as("band_hash")))).as("band"))
      .select(col("doc_id"), col("band.band_no"), col("band.band_hash"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    banded
      .as("a")
      .join(banded.as("b"), Seq("band_no", "band_hash"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
  }

  /** MinHash-estimated Jaccard for candidate pairs, with exact n-gram
    * Jaccard verification — the full dedup pipeline: shingle → minhash →
    * band → bucket-join → verify survivors only.
    */
  def minhashDedupPairs(
      docs: DataFrame,
      threshold: Double,
      k: Int = 32,
      bands: Int = 8,
      shingle: Int = 3): DataFrame = {
    val sh = docs
      .select(col("doc_id"), shingleHashes(col("text"), shingle).as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    lshCandidatePairs(docs, k, bands, shingle)
      .join(sh.withColumnRenamed("doc_id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
      .join(sh.withColumnRenamed("doc_id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
      .select(
        col("id_a"),
        col("id_b"),
        round(
          size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
            size(array_union(col("sh_a"), col("sh_b"))),
          6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** 64-bit SimHash over whitespace tokens: bit b of the signature is the
    * sign of Σ_tokens (±1 by bit b of xxhash64(token)). Near-dups have
    * small Hamming distance between signatures. The 64 per-bit vote
    * counters fold in ONE pass over the token hashes (array of counters
    * as the aggregate accumulator); shift amounts are compile-time
    * constants, so the whole signature is static column algebra.
    */
  def simhashFromHashes(tokHashes: Column): Column = {
    val counts = aggregate(
      tokHashes,
      array((0 until 64).map(_ => lit(0)): _*),
      (acc, h) =>
        array((0 until 64).map { b =>
          element_at(acc, b + 1) +
            when(shiftright(h, b).bitwiseAND(1) === 1, 1).otherwise(-1)
        }: _*))
    (0 until 64)
      .map(b =>
        when(element_at(counts, b + 1) > 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce((x, y) => x.bitwiseOR(y))
  }

  def simhashSignatures(docs: DataFrame): DataFrame =
    docs
      .select(
        col("doc_id"),
        transform(TextOps.tokens(col("text")), t => xxhash64(t)).as("th"))
      .select(col("doc_id"), simhashFromHashes(col("th")).as("simhash"))

  /** Hamming distance between two 64-bit signatures. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Exact token-set Jaccard for all pairs within a blocking key (e.g.
    * `source`) — the brute-force baseline used by oracle checks; the
    * blocked join keeps it Σ|block|², not |D|².
    */
  def blockedJaccardPairs(
      docs: DataFrame,
      blockCol: String,
      threshold: Double): DataFrame = {
    val toksets = docs.select(
      col("doc_id"),
      col(blockCol).as("blk"),
      array_distinct(TextOps.tokens(col("text"))).as("ts"))
    toksets
      .as("a")
      .join(toksets.as("b"), Seq("blk"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("id_a"),
        col("b.doc_id").as("id_b"),
        round(
          size(array_intersect(col("a.ts"), col("b.ts"))).cast("double") /
            size(array_union(col("a.ts"), col("b.ts"))),
          6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
