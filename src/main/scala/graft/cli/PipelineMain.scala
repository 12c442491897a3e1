package graft.cli

import graft.core.GraftSession
import graft.operators.{Sampling, TextOps}
import org.apache.spark.sql.functions._

/** CLI driver for the training-data PREP pipeline (the p1 journey as a
  * standalone job):
  *
  * {{{
  *   PipelineMain <documentsParquet> <output>
  *                [minTokens=5] [chunkSize=32] [stride=16] [budget=512]
  * }}}
  *
  * Stages: quality gate (first-failing-rule reasons) → exact dedup among
  * survivors (min-id representative) → overlapping token chunking →
  * per-shard sequence packing. Outputs, all parquet:
  *   - `<output>/gate_report/`  — doc_id, keep, reason (every input doc)
  *   - `<output>/packed/`       — chunk_uid, source, n_tokens,
  *                                start_offset, seq_id, seq_offset
  *   - `<output>/summary.txt`   — one-line counts (docs → kept → deduped
  *                                → chunks → sequences)
  *
  * The whole job is the composed lazy plan the p1 oracle row hash-locks;
  * this driver only adds argument parsing and sinks.
  */
object PipelineMain {

  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println(
        "usage: PipelineMain <documentsParquet> <output> " +
          "[minTokens] [chunkSize] [stride] [budget]")
      sys.exit(2)
    }
    val input = args(0)
    val output = args(1)
    val minTokens = if (args.length > 2) args(2).toInt else 5
    val chunkSize = if (args.length > 3) args(3).toInt else 32
    val stride = if (args.length > 4) args(4).toInt else 16
    val budget = if (args.length > 5) args(5).toInt else 512

    val existing = org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
    val spark = existing.getOrElse(GraftSession.local("graft-pipeline"))
    try {
      val docs = spark.read.parquet(input)
      val gate = TextOps.filterPipeline(docs, minTokens = minTokens)
      gate.write.mode("overwrite").parquet(s"$output/gate_report")
      val kept = docs.join(
        spark.read.parquet(s"$output/gate_report")
          .filter(col("keep")).select(col("doc_id")),
        Seq("doc_id"), "left_semi")
      val deduped = TextOps.dedupExact(kept)
      val chunks = TextOps.chunkTokens(deduped, chunkSize, stride)
      val packed = Sampling.packSequences(
        chunks
          .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
          .select(
            (col("doc_id") * 100000 + col("chunk_id")).as("chunk_uid"),
            col("source"),
            col("chunk_text").as("text")),
        budget = budget, shardCol = "source", idCol = "chunk_uid")
      packed.write.mode("overwrite").parquet(s"$output/packed")
      val packedBack = spark.read.parquet(s"$output/packed")
      val nSeqs = packedBack.select(col("source"), col("seq_id"))
        .distinct().count()
      val summary =
        s"docs=${docs.count()} kept=${kept.count()} " +
          s"deduped=${deduped.count()} chunks=${packedBack.count()} " +
          s"sequences=$nSeqs"
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(output).resolve("summary.txt"),
        summary + "\n")
      println(summary)
    } finally if (existing.isEmpty) spark.stop()
  }
}
