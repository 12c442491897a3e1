package graft

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 wave: exact substring-level dedup (d50, Lee et al. 2022
  * ExactSubstr).
  */
class SubstringDedupSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  private def docs(rows: Seq[(Long, String)]): DataFrame = {
    val sp = spark
    import sp.implicits._
    rows.toDF("doc_id", "text")
  }

  test("a known cross-doc span surfaces as one maximal run per doc") {
    // an 8-token span S shared by docs 0 and 1; every other token is
    // globally unique, so S's interior k-grams are the only duplicates
    val s8 = (1 to 8).map(i => s"s$i").mkString(" ")
    val d = docs(Seq(
      0L -> s"u1 u2 $s8 v1 v2",
      1L -> s"$s8 w1 w2 w3"))
    val got = Dedup.substringSpans(d, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    // doc 0: S sits at token positions 2..9 → dup grams start 2..5
    // doc 1: S sits at 0..7 → dup grams start 0..3
    assert(got == Set(
      (0L, 2L, 9L, 8L, 4L),
      (1L, 0L, 7L, 8L, 4L)), s"spans wrong: $got")
  }

  test("within-doc repetition is span-duplicated too (same-doc sites)") {
    val r5 = (1 to 5).map(i => s"r$i").mkString(" ")
    val d = docs(Seq(
      2L -> s"m1 m2 $r5 m3 m4 $r5 m5"))
    val got = Dedup.substringSpans(d, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    // R occurs at positions 2..6 and 9..13 — two separate maximal runs,
    // each exactly one duplicated 5-gram long
    assert(got == Set(
      (2L, 2L, 6L, 5L, 1L),
      (2L, 9L, 13L, 5L, 1L)), s"spans wrong: $got")
  }

  test("no duplicated gram → empty output; short docs never emit grams") {
    val d = docs(Seq(
      3L -> "a1 a2 a3 a4 a5 a6",
      4L -> "b1 b2 b3")) // < k tokens: contributes nothing
    assert(Dedup.substringSpans(d, k = 5).count() == 0)
  }

  test("spans are invariant under input partitioning") {
    val s8 = (1 to 8).map(i => s"x$i").mkString(" ")
    val rows = (0L to 19L).map(i =>
      i -> s"p${i}a p${i}b $s8 q${i}a q${i}b")
    val a = Dedup.substringSpans(docs(rows), k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = Dedup.substringSpans(docs(rows).repartition(13), k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a == b && a.size == 20, s"got ${a.size} spans")
  }
}
