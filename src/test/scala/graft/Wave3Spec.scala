package graft

import graft.operators.{GraphBuilder, TextOps}
import graft.streaming.EventStreams
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** k-truss (g32), PMI collocations (d29), and streaming approximate
  * distinct counting (st12).
  */
class KTrussSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  private def truss(
      edges: Seq[(Long, Long)], k: Int, rounds: Int): Set[(Long, Long, Long)] = {
    val sp = spark
    import sp.implicits._
    GraphBuilder.kTruss(edges.toDF("src", "dst"), k, rounds)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  private val k4 = Seq( // complete graph on {0,1,2,3}
    (0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L))

  test("K4 is its own 4-truss: every edge in 2 triangles") {
    val got = truss(k4, k = 4, rounds = 2)
    assert(got == Set(
      (0L, 1L, 2L), (0L, 2L, 2L), (0L, 3L, 2L),
      (1L, 2L, 2L), (1L, 3L, 2L), (2L, 3L, 2L)))
  }

  test("pendant triangle peels off the K4 at k=4, survives at k=3") {
    // K4 plus a triangle {0,1,4} hanging off the (0,1) edge: (0,4) and
    // (1,4) have support 1 → peeled at k=4; (0,1) keeps its two K4
    // triangles and survives with support 2
    val e = k4 ++ Seq((0L, 4L), (1L, 4L))
    val at4 = truss(e, k = 4, rounds = 3)
    assert(at4.map(t => (t._1, t._2)) ==
      k4.toSet && at4.forall(_._3 == 2L))
    val at3 = truss(e, k = 3, rounds = 3)
    assert(at3.map(t => (t._1, t._2)) == (k4 ++ Seq((0L, 4L), (1L, 4L))).toSet)
  }

  test("cascade: two triangles sharing an edge vanish entirely at k=4") {
    // {0,1,2} and {1,2,3} share (1,2): round 1 peels the four support-1
    // edges, round 2 peels the now-triangle-less (1,2), round 3 proves
    // stability — the fixed-round and converged forms agree
    val e = Seq((0L, 1L), (0L, 2L), (1L, 2L), (1L, 3L), (2L, 3L))
    assert(truss(e, k = 4, rounds = 3).isEmpty)
    val sp = spark
    import sp.implicits._
    val (conv, rounds) =
      GraphBuilder.kTrussConverged(e.toDF("src", "dst"), k = 4)
    assert(conv.collect().isEmpty)
    assert(rounds == 3, s"rounds=$rounds")
  }

  test("converged ≡ fixed-round on the gate fixture") {
    val e = graft.sources.SyntheticGraph.portable(spark, 200, 1600, "g32")
    val fixed = GraphBuilder.kTruss(e, k = 4, rounds = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val (convDf, rounds) = GraphBuilder.kTrussConverged(e, k = 4)
    val conv = convDf
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(fixed == conv)
    assert(fixed.size == 60, s"|truss|=${fixed.size}")
    assert(rounds <= 7, s"rounds=$rounds")
  }
}

class CollocationsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  test("hand-computed PMI on a 3-document corpus") {
    val sp = spark
    import sp.implicits._
    // tokens: [a,b], [a,b], [a,c] → N=6, B=3, c(a)=3, c(b)=2, c(c)=1
    // PMI(a,b) = ln((2/3)/((3/6)(2/6))) = ln 4; PMI(a,c) = ln((1/3)/((3/6)(1/6))) = ln 4
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"))
      .toDF("doc_id", "text")
    val got = TextOps.collocations(docs, minCount = 1, topN = 10)
      .collect().map(r =>
        (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val ln4 = BigDecimal(math.log(4.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.toSeq == Seq(("a", "b", 2L, ln4), ("a", "c", 1L, ln4)))
  }

  test("min-count floor drops hapax pairs") {
    val sp = spark
    import sp.implicits._
    val docs = Seq((1L, "x y"), (2L, "x y"), (3L, "p q")).toDF("doc_id", "text")
    val got = TextOps.collocations(docs, minCount = 2, topN = 10)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(got.toSeq == Seq(("x", "y")))
  }
}

class GapFillSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  test("hourly grid forward-fills gaps and leaves leading hours NULL") {
    val sp = spark
    import sp.implicits._
    def ts(hour: Long, min: Long) =
      new java.sql.Timestamp((hour * 60 + min) * 60000L)
    // user 7: events in hours 0 (two — later one wins) and 2; user 9:
    // first event in hour 2 → hours 0-1 stay NULL on the shared grid
    val ev = Seq(
      (1L, ts(0, 10), 7L, "click", 5.0, "{}"),
      (2L, ts(0, 50), 7L, "click", 6.0, "{}"),
      (3L, ts(2, 0), 7L, "click", 9.0, "{}"),
      (4L, ts(2, 30), 9L, "click", 4.0, "{}"),
      (5L, ts(3, 0), 9L, "click", 2.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = graft.operators.TemporalJoins.gapFillHourly(ev)
      .collect()
      .map { r =>
        val hour = java.time.LocalDateTime
          .parse(r.getString(1), java.time.format.DateTimeFormatter
            .ofPattern("yyyy-MM-dd HH:mm:ss"))
          .getHour.toLong
        ((r.getLong(0), hour),
          if (r.isNullAt(2)) Double.NaN else r.getDouble(2))
      }
      .toMap
    assert(got((7L, 0L)) == 6.0) // later event in the hour wins
    assert(got((7L, 1L)) == 6.0) // gap forward-filled
    assert(got((7L, 2L)) == 9.0)
    assert(got((7L, 3L)) == 9.0) // fill extends to the global grid end
    assert(got((9L, 0L)).isNaN) // before user 9's first event
    assert(got((9L, 1L)).isNaN)
    assert(got((9L, 2L)) == 4.0)
    assert(got((9L, 3L)) == 2.0)
  }
}

class ExactlyOnceSinkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  test("replaying a batch overwrites its partition instead of duplicating") {
    val sp = spark
    import sp.implicits._
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_st13_spec").toString
    try {
      val b0 = Seq((1L, "click", 1.0), (2L, "view", 2.0))
        .toDF("event_id", "event_type", "value")
      val b1 = Seq((3L, "click", 3.0)).toDF("event_id", "event_type", "value")
      EventStreams.writeBatchIdempotent(b0, 0L, tmp)
      // the retry: same batch id again — MUST overwrite, not append
      EventStreams.writeBatchIdempotent(b0, 0L, tmp)
      EventStreams.writeBatchIdempotent(b1, 1L, tmp)
      // and a retry AFTER later batches must not disturb them
      EventStreams.writeBatchIdempotent(b0, 0L, tmp)
      val got = spark.read.parquet(tmp)
        .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(got == Seq(1L, 2L, 3L), got)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(tmp))
        .iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }
}

class PqPropertySpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  test("PQ codes are invariant under repartitioning") {
    import graft.operators.Similarity
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def codes(df: org.apache.spark.sql.DataFrame) =
      Similarity.pqCodes(df, m = 8, k = 16)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(codes(emb) == codes(emb.repartition(7)))
  }
}

class StreamingApproxSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  test("streaming windowed approx-distinct equals the batch twin") {
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    def ts(min: Long) = new java.sql.Timestamp(3600000L + min * 60000L)
    val rows = (0 until 40).map(i =>
      EventStreams.Event(i.toLong, ts(i % 12), (i % 7).toLong, "click", 1.0))
    val ms = MemoryStream[EventStreams.Event]
    // out-of-order across three micro-batches
    ms.addData(rows.drop(25): _*)
    ms.addData(rows.slice(10, 25): _*)
    ms.addData(rows.take(10): _*)
    val q = EventStreams.windowedApproxDistinct(ms.toDS().toDF())
      .writeStream.format("memory").queryName("st12_unit")
      .outputMode("complete").start()
    try q.processAllAvailable()
    finally q.stop()
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        .sortBy(t => (t._1, t._2)).toSeq
    val streamed = canon(spark.table("st12_unit"))
    val batch = canon(EventStreams.windowedApproxDistinct(rows.toDF()))
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("approx stays within 5% of exact distinct on real events") {
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    val approx = EventStreams.windowedApproxDistinct(ev)
    val exact = ev
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(countDistinct(col("user_id")).as("xu"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("win_start"),
        col("event_type"), col("xu"))
    val err = approx.join(exact, Seq("win_start", "event_type"))
      .select(
        (abs(col("approx_users") - col("xu")) /
          greatest(col("xu"), lit(1L))).as("rel"))
      .agg(max(col("rel"))).first().getDouble(0)
    assert(err <= 0.05, s"max rel err $err")
  }
}
