package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Vector-similarity operators over an `embeddings(vec_id, embedding
  * ARRAY<FLOAT>, label)` table.
  *
  * Dot products are expressed with `zip_with` + `aggregate` — pure
  * Catalyst expressions, fully codegen'd, no UDF. The fold is sequential
  * over the array in both Spark and the DuckDB oracle, so results match
  * bit-for-bit modulo the final rounding.
  */
object Similarity {

  /** Sequential-fold dot product of two double arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x * y),
      lit(0.0),
      (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Brute-force top-k nearest neighbours of one probe vector by cosine.
    * The probe is a one-row frame → broadcast join; the scan side streams
    * once with no shuffle; TakeOrderedAndProject bounds the result. This
    * is the exact-baseline path; [[knnLsh]] is the scale path.
    */
  def knnToProbe(embeddings: DataFrame, probeId: Long, k: Int): DataFrame = {
    val probe = broadcast(
      embeddings
        .filter(col("vec_id") === probeId)
        .select(asDouble(col("embedding")).as("probe_emb")))
    embeddings
      .filter(col("vec_id") =!= probeId)
      .crossJoin(probe)
      .select(
        col("vec_id"),
        round(cosine(asDouble(col("embedding")), col("probe_emb")), 6)
          .as("cos_sim"))
      .orderBy(desc("cos_sim"), asc("vec_id"))
      .limit(k)
  }

  /** All-pairs near-duplicate candidates above a cosine threshold via
    * random-hyperplane LSH (SimHash for vectors): vectors agreeing on all
    * `bits` signs of seeded pseudo-random hyperplanes land in one bucket;
    * only within-bucket pairs are scored. The cross product never
    * materializes — the shuffle is by bucket key, so cost is Σ|bucket|²
    * instead of |V|². Hyperplanes are generated from a seeded xxhash64 of
    * (bit, dim) so the bucketing is deterministic across runs and engines.
    */
  def nearDupPairs(
      embeddings: DataFrame,
      threshold: Double,
      bits: Int = 12,
      seed: Long = 42L): DataFrame = {
    val emb = asDouble(col("embedding"))
    // sign bit b = sign(Σ_d h(b,d)·x_d) with h a deterministic ±1 hash
    val sig = concat(
      (0 until bits).map { b =>
        val proj = aggregate(
          zip_with(
            emb,
            sequence(lit(0), size(col("embedding")) - 1),
            (x, d) =>
              x * (when(
                pmod(xxhash64(lit(seed), lit(b), d), lit(2)) === 0,
                lit(1.0)).otherwise(lit(-1.0)))),
          lit(0.0),
          (acc, v) => acc + v)
        when(proj >= 0, lit("1")).otherwise(lit("0"))
      }: _*)
    // persist: the bucketed frame feeds both sides of the self-join;
    // without the barrier the hyperplane projection is recomputed per side
    val bucketed = embeddings
      .select(col("vec_id"), emb.as("e"), sig.as("bucket"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    bucketed
      .as("a")
      .join(bucketed.as("b"), Seq("bucket"))
      .filter(col("a.vec_id") < col("b.vec_id"))
      .select(
        col("a.vec_id").as("id_a"),
        col("b.vec_id").as("id_b"),
        round(cosine(col("a.e"), col("b.e")), 6).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }
}
