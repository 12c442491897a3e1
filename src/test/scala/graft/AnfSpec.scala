package graft

import graft.operators.Anf
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** HyperBall/ANF (g30): hand-computed exact values in the sketch's exact
  * regime, the plateau early stop, and the estimate's accuracy beyond the
  * exact regime.
  */
class AnfSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  test("path graph: exact hand-computed N(h)") {
    val sp = spark
    import sp.implicits._
    // 0→1→2→3: N(0)=4, N(1)=4+3 (three edges), N(2)=7+2, N(3)=9+1
    val e = Seq((0L, 1L), (1L, 2L), (2L, 3L)).toDF("src", "dst")
    val got = Anf.neighborhoodFunction(e, maxH = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 4L, 1L -> 7L, 2L -> 9L, 3L -> 10L))
  }

  test("plateau early stop: complete digraph emits the constant tail") {
    val sp = spark
    import sp.implicits._
    // K4 with self-loops excluded: everything reachable in 1 hop —
    // N(1) = 16 and every later h must repeat it without running joins
    val ids = 0L until 4L
    val e = (for { a <- ids; b <- ids if a != b } yield (a, b))
      .toDF("src", "dst")
    val got = Anf.neighborhoodFunction(e, maxH = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(0L) == 4L)
    (1 to 5).foreach(h => assert(got(h.toLong) == 16L, s"h=$h: ${got}"))
  }

  test("monotone: N(h) never decreases on the gate fixture") {
    val e = graft.sources.SyntheticGraph.portable(spark, 300, 1500, "g30")
    val nf = Anf.neighborhoodFunction(e, maxH = 4)
      .orderBy("h").collect().map(_.getLong(1))
    assert(nf.sliding(2).forall(p => p(1) >= p(0)), nf.mkString(","))
    assert(nf(0) == 300L) // |V| on this fixture (every id 0..299 hit)
  }

  test("harmonic centrality: hand-computed on a path graph") {
    val sp = spark
    import sp.implicits._
    // 0→1→2→3: H(0)=1+1/2+1/3, H(1)=1+1/2, H(2)=1, H(3)=0
    val e = Seq((0L, 1L), (1L, 2L), (2L, 3L)).toDF("src", "dst")
    val got = Anf.harmonicCentrality(e, maxH = 4, topN = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == Map(
      0L -> r6(1.0 + 0.5 + 1.0 / 3.0), 1L -> 1.5, 2L -> 1.0, 3L -> 0.0))
  }

  test("beyond the exact regime the estimate stays within HLL rsd bounds") {
    val sp = spark
    import sp.implicits._
    // one sketch over 200k distinct ids — far past the lgK=12 coupon
    // limit; rsd ≈ 1.04/√4096 ≈ 1.6%, assert a 3× margin. This is the
    // regime a 100 TB ANF actually runs in; the gate fixture's exact
    // regime is what makes g30 hash-checkable.
    val n = 200000L
    val est = spark.range(n)
      .agg(hll_sketch_estimate(hll_sketch_agg(col("id"), lit(12))))
      .first().getLong(0)
    val rel = math.abs(est.toDouble / n - 1.0)
    assert(rel < 0.05, s"estimate=$est rel_err=$rel")
  }
}
