package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reader/writer for the reference's MapReduce iteration-state text format
  * (FIXTURES.md §1.2; reference PageRankDriver.java:443 doc comment,
  * GraphBuilderReducer.java:34-37, PageRankMapper.java:38-69):
  *
  * {{{ NodeID \t PR|out1,out2,... }}}
  *
  * An empty list after `|` marks a dangling node. The engine normalizes
  * to two columnar frames — `ranks(id, rank)` + `adjacency(id, outlinks)`
  * — instead of carrying packed strings through the computation (packed
  * strings defeat column pruning/pushdown, SURVEY.md §4.2); this adapter
  * exists so users of the reference's on-disk state can ingest/emit it
  * unchanged.
  */
object IterationStateIO {

  /** Parse state text into `(id LONG, rank DOUBLE, outlinks ARRAY<LONG>)`.
    * Malformed rows (no tab, no pipe, non-numeric) are dropped, matching
    * the reference's DataQuality-counter-and-skip behavior
    * (PageRankMapper.java:40-66).
    */
  def read(spark: SparkSession, path: String): DataFrame =
    fromLines(spark.read.text(path))

  def fromLines(lines: DataFrame): DataFrame = {
    val col0 = lines.columns.head
    lines
      .select(col(col0).as("line"))
      .filter(trim(col("line")) =!= "" && !col("line").startsWith("#"))
      .select(
        split(col("line"), "\t", 2).as("kv"))
      .filter(size(col("kv")) === 2 && instr(col("kv").getItem(1), "|") > 0)
      // try_cast throughout: ANSI mode (Spark 4 default) makes plain casts
      // THROW on malformed tokens; the reference skips bad rows/links
      // (PageRankMapper.java DataQuality counters)
      .select(
        expr("try_cast(kv[0] AS BIGINT)").as("id"),
        expr("try_cast(substring_index(kv[1], '|', 1) AS DOUBLE)")
          .as("rank"),
        // everything after the first '|'; empty string ⇒ dangling
        expr("substring(kv[1], instr(kv[1], '|') + 1)").as("links_str"))
      .select(
        col("id"),
        col("rank"),
        when(col("links_str") === "", array().cast("array<long>"))
          .otherwise(
            // non-numeric neighbor tokens → null via rlike-guarded cast
            // (conditional, so ANSI cast never sees bad input) — dropped
            // rather than corrupting N / leaking rank mass
            filter(
              transform(
                split(col("links_str"), ","),
                s => when(s.rlike("^-?\\d+$"), s.cast("long"))),
              x => x.isNotNull))
          .as("outlinks"))
      .filter(col("id").isNotNull && col("rank").isNotNull)
  }

  /** Render state rows back to the reference's packed text format with the
    * reference's 10-decimal rank formatting (PageRankReducer.java:119) —
    * note the reference loses precision here each iteration; the engine
    * only formats on export.
    */
  def toLines(state: DataFrame): DataFrame =
    state.select(
      concat(
        col("id").cast("string"),
        lit("\t"),
        format_string("%.10f", col("rank")),
        lit("|"),
        concat_ws(",", col("outlinks"))).as("value"))

  def write(state: DataFrame, path: String): Unit =
    toLines(state).coalesce(1).write.mode("overwrite").text(path)
}
