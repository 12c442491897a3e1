package graft

import graft.operators.{Profiler, TemporalJoins}
import graft.operators.Profiler.RowCheck
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-14 advice hardening: the fold-compact completed-retry guard,
  * the empty-interval contract, the uniqueness null-key semantics pin,
  * the approx-uniqueness expectation (q51c), and the converged-loop
  * empty-input guards.
  */
class DvFoldRetryGuardSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  private def withDirs(f: (String, String, String) => Unit): Unit = {
    val dirs = Seq("dvg_base", "dvg_dv", "dvg_comp")
      .map(p => java.nio.file.Files.createTempDirectory(p).toString)
    try f(dirs(0), dirs(1), dirs(2))
    finally {
      import scala.jdk.CollectionConverters._
      dirs.foreach { d =>
        java.nio.file.Files.walk(java.nio.file.Paths.get(d))
          .iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      }
    }
  }

  test("retry after a COMPLETED fold no-ops — no resurrection") {
    val sp = spark
    import sp.implicits._
    withDirs { (base, dv, comp) =>
      (1L to 10L).map(k => (k, s"v$k")).toDF("k", "v")
        .write.mode("overwrite").parquet(base)
      graft.sources.DeletionVectors.appendDeletes(Seq(3L, 7L).toDF("k"), dv)
      graft.sources.DeletionVectors.foldCompact(spark, base, dv, "k", comp)
      val once = spark.read.parquet(comp)
        .collect().map(_.getLong(0)).toSet
      assert(once == (1L to 10L).toSet -- Set(3L, 7L))
      // the ADVICE r13 window: the caller (or an orchestrator) retries
      // the SAME foldCompact call after the truncation completed — the
      // sidecar is empty and re-folding the ORIGINAL base would
      // overwrite comp with rows 3 and 7 resurrected. Must no-op.
      graft.sources.DeletionVectors.foldCompact(spark, base, dv, "k", comp)
      val again = spark.read.parquet(comp)
        .collect().map(_.getLong(0)).toSet
      assert(again == once, "completed-fold retry must not resurrect rows")
    }
  }

  test("empty sidecar onto a FRESH dir still folds (plain copy)") {
    val sp = spark
    import sp.implicits._
    withDirs { (base, dv, comp) =>
      (1L to 5L).map(k => (k, s"v$k")).toDF("k", "v")
        .write.mode("overwrite").parquet(base)
      // an appended-then-folded-elsewhere lifecycle can leave a
      // zero-row sidecar; folding into a NEW dir is a copy, not a no-op
      graft.sources.DeletionVectors.appendDeletes(
        Seq.empty[Long].toDF("k"), dv)
      graft.sources.DeletionVectors.foldCompact(spark, base, dv, "k", comp)
      assert(spark.read.parquet(comp).count() == 5L)
    }
  }
}

class IntervalContractSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  test("an EMPTY interval fails fast and names the side") {
    val sp = spark
    import sp.implicits._
    val l = Seq((1L, 10L, 10L)).toDF("k", "llo", "lhi") // [10, 10) = ∅
    val r = Seq((1L, 0L, 100L)).toDF("k", "rlo", "rhi")
    val ex = intercept[Exception] {
      TemporalJoins.bucketedIntervalJoin(
        l, r, "k", "llo", "lhi", "rlo", "rhi", bucketWidth = 1000L)
        .collect()
    }
    val msg = Option(ex.getMessage).getOrElse("") +
      Option(ex.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("left interval empty"),
      s"expected the left empty-interval error, got: $msg")
  }

  test("empty interval on the RIGHT side also fails, names right") {
    val sp = spark
    import sp.implicits._
    val l = Seq((1L, 0L, 100L)).toDF("k", "llo", "lhi")
    val r = Seq((1L, 50L, 50L)).toDF("k", "rlo", "rhi")
    val ex = intercept[Exception] {
      TemporalJoins.bucketedIntervalJoin(
        l, r, "k", "llo", "lhi", "rlo", "rhi", bucketWidth = 1000L)
        .collect()
    }
    val msg = Option(ex.getMessage).getOrElse("") +
      Option(ex.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("right interval empty"),
      s"expected the right empty-interval error, got: $msg")
  }
}

/** Uniqueness null-key semantics (exact) and the q51c approximate twin. */
class ApproxUniqueSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  test("exact uniqueness: every null-key-component row is a violation") {
    val sp = spark
    import sp.implicits._
    // 5 rows; (a, b) tuples: (1,x), (1,x) dup, (2,y), (null,z), (3,null)
    // → non-null-distinct 2, so violations = 5 − 2 = 3: the dup surplus
    // (1) + BOTH null-component rows — the PK reading the Scaladoc pins
    val df = Seq(
      (Option(1L), Option("x")), (Option(1L), Option("x")),
      (Option(2L), Option("y")), (Option.empty[Long], Option("z")),
      (Option(3L), Option.empty[String])).toDF("a", "b")
    val got = Profiler.expectations(
      df, rowChecks = Nil, uniqueKeys = Seq(("pk_ab", Seq("a", "b"))))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    assert(got.toSeq == Seq(("pk_ab", 3L, false)))
  }

  test("approx twin agrees with exact within rsd; both verdicts match") {
    val sp = spark
    import sp.implicits._
    val rsd = 0.02
    // clean key: 2000 distinct longs — must pass even when the sketch
    // undershoots (the noise-floor threshold, never == 0)
    val clean = (1L to 2000L).toDF("k")
    val cRow = Profiler.expectationsApproxUnique(
      clean, Seq(("uk", Seq("k"))), rsd).collect().head
    assert(cRow.getBoolean(2), s"clean key must pass, est=${cRow.getLong(1)}")
    // the estimate is rsd-bounded: |est_violations| = |n − approx_nd|
    // ≤ 5·rsd·n with wide margin (HLL++ rsd is a standard error)
    assert(math.abs(cRow.getLong(1)) <= (5 * rsd * 2000).toLong,
      s"estimate drift ${cRow.getLong(1)} beyond 5·rsd·n")
    // dirty key: 2000 rows over 1000 distinct — a 100% surplus is far
    // beyond any sketch noise; must FAIL
    val dirty = (1L to 2000L).map(i => i % 1000L).toDF("k")
    val dRow = Profiler.expectationsApproxUnique(
      dirty, Seq(("uk", Seq("k"))), rsd).collect().head
    assert(!dRow.getBoolean(2), "a 2× duplicated key must fail the sketch")
    assert(math.abs(dRow.getLong(1) - 1000L) <= (5 * rsd * 1000).toLong,
      s"surplus estimate ${dRow.getLong(1)} should be ~1000 within rsd")
  }

  test("false-pass price is rsd-bounded: sub-noise surplus reads clean") {
    val sp = spark
    import sp.implicits._
    val rsd = 0.02
    // 2000 rows with a surplus of 10 — well UNDER the noise floor
    // ceil(3·0.02·~1990) ≈ 120, so the drift signal stays quiet: the
    // documented false pass, bounded by noiseFactor·rsd·nd. The exact
    // gate (q51) is the correctness instrument for surpluses this size.
    val tiny = ((1L to 1990L) ++ (1L to 10L)).toDF("k")
    val row = Profiler.expectationsApproxUnique(
      tiny, Seq(("uk", Seq("k"))), rsd).collect().head
    assert(row.getBoolean(2),
      s"sub-noise surplus must read clean (est=${row.getLong(1)})")
    // and the exact form catches it — the differential that prices the
    // trade: sketch for drift, exact for gating
    val exact = Profiler.expectations(
      tiny, rowChecks = Nil, uniqueKeys = Seq(("uk", Seq("k"))))
      .collect().head
    assert(exact.getLong(1) == 10L && !exact.getBoolean(2))
  }

  test("approx twin mirrors the exact null semantics; one scan for all keys") {
    val sp = spark
    import sp.implicits._
    val df = Seq(
      (Option(1L), Option(10L)), (Option(1L), Option(10L)),
      (Option.empty[Long], Option(20L))).toDF("a", "b")
    val got = Profiler.expectationsApproxUnique(
      df, Seq(("pk_ab", Seq("a", "b")), ("uk_b", Seq("b"))), rsd = 0.01)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // pk_ab: 3 rows, 1 distinct non-null tuple → 2 (dup + null row);
    // tiny cardinalities are exact in HLL++ (dense below threshold)
    assert(got("pk_ab") == 2L)
    assert(got("uk_b") == 1L) // the duplicated 10
    // all sketches ride ONE aggregate over ONE scan: no Expand (the
    // exact multi-distinct would add one), exactly one scan node
    val wide = df.agg(
      (count(lit(1)) - approx_count_distinct(struct(col("a"), col("b"))))
        .as("v0"),
      (count(lit(1)) - approx_count_distinct(col("b"))).as("v1"))
    val plan = wide.queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), "HLL sketches must not force Expand")
  }
}

class ConvergedEmptyGuardSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  test("HITS converged fails loudly on an edgeless input") {
    val sp = spark
    import sp.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    val ex = intercept[IllegalArgumentException] {
      graft.operators.Hits.runConverged(empty, maxK = 5, tol = 1e-6)
    }
    assert(ex.getMessage.contains("non-empty edge set"))
  }

  test("SSSP converged fails loudly on an empty source set") {
    val sp = spark
    import sp.implicits._
    val edges = Seq((1L, 2L, 1.0)).toDF("src", "dst", "w")
    val noSeeds = Seq.empty[Long].toDF("id")
    val ex = intercept[IllegalArgumentException] {
      graft.operators.ShortestPaths.runConverged(edges, noSeeds)
    }
    assert(ex.getMessage.contains("non-empty source set"))
  }
}
