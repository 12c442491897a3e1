package graft

import graft.operators.{Sampling, TemporalJoins, TextOps}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TemporalJoinsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  private def asof(
      probes: Seq[(Long, Long)], quotes: Seq[(Long, Long, String)]) = {
    val sp = spark
    import sp.implicits._
    TemporalJoins
      .asofJoin(
        probes.toDF("k", "pt"),
        quotes.toDF("k", "qt", "v"),
        key = "k", leftTs = "pt", rightTs = "qt", payload = Seq("v", "qt"))
      .collect()
      .map(r =>
        (r.getAs[Long]("k"), r.getAs[Long]("pt"), r.getAs[String]("v"),
          Option(r.getAs[java.lang.Long]("qt")).map(_.toLong)))
      .sortBy(t => (t._1, t._2))
      .toSeq
  }

  test("asofJoin picks latest quote at-or-before each probe, per key") {
    val out = asof(
      probes = Seq((1L, 10L), (1L, 25L), (2L, 10L)),
      quotes = Seq((1L, 5L, "a"), (1L, 20L, "b"), (2L, 50L, "z")))
    assert(out == Seq(
      (1L, 10L, "a", Some(5L)),
      (1L, 25L, "b", Some(20L)),
      (2L, 10L, null, None))) // quote strictly after probe ⇒ no match
  }

  test("asofJoin is inclusive: quote exactly at the probe instant wins") {
    val out = asof(
      probes = Seq((1L, 10L)),
      quotes = Seq((1L, 10L, "now"), (1L, 3L, "old")))
    assert(out == Seq((1L, 10L, "now", Some(10L))))
  }

  test("asofJoin keeps every probe row (left-outer semantics)") {
    val out = asof(probes = Seq((9L, 1L), (9L, 2L)), quotes = Seq())
    assert(out.map(_._3).forall(_ == null) && out.size == 2)
  }

  test("bucketedRangeJoin matches across bucket boundaries exactly") {
    val sp = spark
    import sp.implicits._
    // width 10: probe [8, 18) spans buckets 0 and 1; matches 8,9,10,17
    // but not 7 (below) or 18 (half-open upper bound)
    val left = Seq((1L, 8L, 18L)).toDF("k", "lo", "hi")
    val right = Seq(7L, 8L, 9L, 10L, 17L, 18L).map((1L, _)).toDF("k", "t")
    val got = TemporalJoins
      .bucketedRangeJoin(left, right, "k", "lo", "hi", "t", bucketWidth = 10L)
      .select(col("t")).collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(8L, 9L, 10L, 17L))
  }

  test("bucketedRangeJoin equals naive theta join on random data") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(7)
    val left = Seq.tabulate(60)(i =>
      (rnd.nextInt(5).toLong, { val a = rnd.nextInt(500).toLong; a },
        i.toLong)).map { case (k, lo, id) =>
      (k, lo, lo + 1 + rnd.nextInt(50), id)
    }.toDF("k", "lo", "hi", "pid")
    val right = Seq.fill(300)(
      (rnd.nextInt(5).toLong, rnd.nextInt(600).toLong)).toDF("k", "t")
    val fast = TemporalJoins
      .bucketedRangeJoin(left, right, "k", "lo", "hi", "t", bucketWidth = 51L)
      .groupBy("pid").count().collect().map(r => (r.getLong(0), r.getLong(1)))
      .toMap
    val naive = left
      .join(right, Seq("k"))
      .filter(col("t") >= col("lo") && col("t") < col("hi"))
      .groupBy("pid").count().collect().map(r => (r.getLong(0), r.getLong(1)))
      .toMap
    assert(fast == naive)
  }

  test("bucketedRangeJoin fails fast on an interval wider than the bucket") {
    val sp = spark
    import sp.implicits._
    val left = Seq((1L, 0L, 100L)).toDF("k", "lo", "hi")
    val right = Seq((1L, 5L)).toDF("k", "t")
    val ex = intercept[Exception] {
      TemporalJoins
        .bucketedRangeJoin(left, right, "k", "lo", "hi", "t", 10L)
        .count()
    }
    assert(ex.getMessage.contains("bucketedRangeJoin") ||
      Option(ex.getCause).exists(_.getMessage.contains("bucketedRangeJoin")))
  }
}

class SamplingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  test("assignSplit is deterministic and ~90/5/5") {
    val sp = spark
    import sp.implicits._
    val docs = (0L until 10000L).toDF("doc_id")
    val counts = Sampling.assignSplit(docs)
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(counts("train") - 9000L) < 300)
    assert(math.abs(counts("val") - 500L) < 150)
    assert(math.abs(counts("test") - 500L) < 150)
    // decision is a pure function of (id, salt): any partitioning agrees
    val a = Sampling.assignSplit(docs).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val b = Sampling.assignSplit(docs.repartition(7)).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(a == b)
  }

  test("stratumCap keeps exactly cap rows per stratum, deterministically") {
    val sp = spark
    import sp.implicits._
    val docs = (0L until 400L).map(i => (i, s"s${i % 4}")).toDF("doc_id", "source")
    val capped = Sampling.stratumCap(docs, "source", cap = 10)
    val kept = capped.filter(col("kept") === 1)
      .groupBy("source").count().collect().map(_.getLong(1))
    assert(kept.length == 4 && kept.forall(_ == 10L))
    val a = capped.filter(col("kept") === 1).select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    val b = Sampling.stratumCap(docs.repartition(13), "source", cap = 10)
      .filter(col("kept") === 1).select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b)
  }

  test("simhash banded near-dup join equals brute force and finds planted dups") {
    val sp = spark
    import sp.implicits._
    import graft.operators.Dedup
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val docs = (Seq(
      (0L, base),
      (1L, base), //                  exact dup of 0 -> hamming 0
      (2L, base + " tail"), //        near dup
      (3L, "completely different content about spark catalyst plans")
    ) ++ (10L until 40L).map(i => (i, s"filler doc number $i with words " + ("x" + i) * 3)))
      .toDF("doc_id", "text")
    val banded = Dedup.simhashNearDupPairs(docs, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // brute force over the portable signatures
    val sigs = Dedup.simhashSignaturesPortable(docs)
    val brute = sigs.as("a").join(sigs.as("b"),
        org.apache.spark.sql.functions.col("a.doc_id") <
          org.apache.spark.sql.functions.col("b.doc_id"))
      .select(
        org.apache.spark.sql.functions.col("a.doc_id"),
        org.apache.spark.sql.functions.col("b.doc_id"),
        Dedup.hamming(
          org.apache.spark.sql.functions.col("a.simhash"),
          org.apache.spark.sql.functions.col("b.simhash")).cast("int"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .filter(_._3 <= 3).toSet
    assert(banded == brute)
    assert(banded.contains((0L, 1L, 0))) // exact dup found at distance 0
  }

  test("triangleCounts: direction, multi-edges and self-loops don't distort") {
    val sp = spark
    import sp.implicits._
    // triangle 1-2-3; pendant 3-4; noise: reversed dup edge, self-loop
    val e = Seq(
      1L -> 2L, 2L -> 3L, 1L -> 3L, 3L -> 4L,
      2L -> 1L, 1L -> 1L).toDF("src", "dst")
    val got = graft.operators.GraphBuilder.triangleCounts(e)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 0L))
  }

  test("repeatedNgramStats counts duplicate 3-grams") {
    val sp = spark
    import sp.implicits._
    val docs = Seq(
      (1L, "a b a b a b"), // 4 3-grams, 2 distinct → ratio 0.5
      (2L, "x y"), //          too short → 0 n-grams
      (3L, "p q r") //         exactly one 3-gram
    ).toDF("doc_id", "text")
    val got = TextOps.repeatedNgramStats(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 4L, 2L, 0.5),
      (2L, 0L, 0L, 0.0),
      (3L, 1L, 1L, 0.0)))
  }
}
