package graft

import graft.streaming.EventStreams
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** st11 (left-outer stream-stream interval join) and io4 (hive-partitioned
  * pruned scan): the streaming watermark-expiry path and the
  * partition-pruning plan contract.
  */
class IoAndOuterJoinSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  test("outer attribution: unmatched purchases flush by watermark expiry") {
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val base = 1700000000000L
    def ev(id: Long, u: Long, tpe: String, sec: Long) = EventStreams.Event(
      id, new java.sql.Timestamp(base + sec * 1000L), u, tpe, 1.0)
    val rows = Seq(
      ev(1, 1, "click", 100), //    inside window of purchase 10
      ev(2, 1, "click", 3000), //   inside
      ev(10, 1, "purchase", 3600),
      ev(3, 1, "click", 3600), //   NOT < p_ts (same instant) ⇒ excluded
      ev(4, 2, "click", 50), //     > 1h before purchase 11 ⇒ excluded
      ev(11, 2, "purchase", 7300), // NO qualifying click ⇒ null row
      ev(5, 1, "click", 4000)) //   after purchase ⇒ excluded
    val ms = MemoryStream[EventStreams.Event]
    // out-of-order feed, then sentinel pairs (user 99) to advance BOTH
    // side's watermarks far past every real event so the unmatched
    // purchase's state expires and its null row emits; a second sentinel
    // batch lets the post-watermark eviction run
    ms.addData(rows(2), rows(0))
    ms.addData(rows.drop(3) :+ rows(1): _*)
    val q = EventStreams.attributionJoinOuter(ms.toDS().toDF()).writeStream
      .format("memory").queryName("attr_outer").outputMode("append").start()
    try {
      q.processAllAvailable()
      ms.addData(ev(90, 99, "click", 200000), ev(91, 99, "purchase", 200001))
      q.processAllAvailable()
      ms.addData(ev(92, 99, "click", 300000), ev(93, 99, "purchase", 300001))
      q.processAllAvailable()
    } finally q.stop()
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), if (r.isNullAt(2)) -1L else r.getLong(2))
    val got = spark.table("attr_outer")
      .filter(col("user_id") =!= 99L).collect().map(key).toSet
    val batch = EventStreams.attributionJoinOuter(rows.toDF())
      .collect().map(key).toSet
    assert(batch == Set((10L, 1L), (10L, 2L), (11L, -1L)))
    assert(got == batch)
  }

  test("full attribution: BOTH sides' unmatched rows flush by expiry") {
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val base = 1700000000000L
    def ev(id: Long, u: Long, tpe: String, sec: Long) = EventStreams.Event(
      id, new java.sql.Timestamp(base + sec * 1000L), u, tpe, 1.0)
    val rows = Seq(
      ev(1, 1, "click", 100), //    matches purchase 10
      ev(10, 1, "purchase", 3600),
      ev(11, 2, "purchase", 7300), // NO qualifying click ⇒ (11, null)
      ev(5, 3, "click", 4000)) //   NO purchase at all ⇒ (null, 5)
    val ms = MemoryStream[EventStreams.Event]
    ms.addData(rows(2), rows(0))
    ms.addData(rows(3), rows(1))
    val q = EventStreams.attributionJoinFull(ms.toDS().toDF()).writeStream
      .format("memory").queryName("attr_full").outputMode("append").start()
    try {
      q.processAllAvailable()
      // sentinels advance both watermarks so both sides' orphans evict
      ms.addData(ev(90, 99, "click", 200000), ev(91, 99, "purchase", 200001))
      q.processAllAvailable()
      ms.addData(ev(92, 99, "click", 300000), ev(93, 99, "purchase", 300001))
      q.processAllAvailable()
    } finally q.stop()
    def key(r: org.apache.spark.sql.Row) =
      (if (r.isNullAt(0)) -1L else r.getLong(0),
        if (r.isNullAt(2)) -1L else r.getLong(2))
    val got = spark.table("attr_full")
      .filter(col("user_id") =!= 99L).collect().map(key).toSet
    val batch = EventStreams.attributionJoinFull(rows.toDF())
      .collect().map(key).toSet
    assert(batch == Set((10L, 1L), (11L, -1L), (-1L, 5L)))
    assert(got == batch)
  }

  test("right attribution: orphan CLICKS flush by watermark expiry") {
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val base = 1700000000000L
    def ev(id: Long, u: Long, tpe: String, sec: Long) = EventStreams.Event(
      id, new java.sql.Timestamp(base + sec * 1000L), u, tpe, 1.0)
    val rows = Seq(
      ev(1, 1, "click", 100), //    converts into purchase 10
      ev(10, 1, "purchase", 3600),
      ev(11, 2, "purchase", 7300), // purchase w/o click ⇒ DROPPED here
      ev(5, 3, "click", 4000), //   never converts ⇒ (null, 5)
      ev(6, 1, "click", 3600)) //   same instant as purchase ⇒ (null, 6)
    val ms = MemoryStream[EventStreams.Event]
    ms.addData(rows(2), rows(0))
    ms.addData(rows(4), rows(3), rows(1))
    val q = EventStreams.attributionJoinRight(ms.toDS().toDF()).writeStream
      .format("memory").queryName("attr_right").outputMode("append").start()
    try {
      q.processAllAvailable()
      // sentinels advance both watermarks so the orphan clicks evict
      ms.addData(ev(90, 99, "click", 200000), ev(91, 99, "purchase", 200001))
      q.processAllAvailable()
      ms.addData(ev(92, 99, "click", 300000), ev(93, 99, "purchase", 300001))
      q.processAllAvailable()
    } finally q.stop()
    def key(r: org.apache.spark.sql.Row) =
      (if (r.isNullAt(0)) -1L else r.getLong(0), r.getLong(2))
    val got = spark.table("attr_right")
      .filter(col("user_id") =!= 99L).collect().map(key).toSet
    val batch = EventStreams.attributionJoinRight(rows.toDF())
      .collect().map(key).toSet
    assert(batch == Set((10L, 1L), (-1L, 5L), (-1L, 6L)))
    assert(got == batch, "streaming replay must equal the batch twin")
  }

  test("io4: partition filter prunes directories at the file level") {
    val sp = spark
    import sp.implicits._
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_io4_spec").toString
    try {
      Seq(
        (1L, "click", 1.0), (2L, "view", 2.0), (3L, "purchase", 3.0),
        (4L, "error", 4.0), (5L, "signup", 5.0), (6L, "click", 6.0))
        .toDF("event_id", "event_type", "value")
        .write.mode("overwrite").partitionBy("event_type").parquet(tmp)
      val pruned = spark.read.parquet(tmp)
        .filter(col("event_type").isin("click", "purchase"))
      val plan = pruned.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters: ["), plan)
      assert(
        "PartitionFilters: \\[[^\\]]*event_type".r.findFirstIn(plan).isDefined,
        "event_type filter must prune at the partition level: " + plan)
      // the EXECUTED scan must touch only the files under the two
      // selected dirs (inputFiles is pre-pruning; the scan's numFiles
      // metric is what actually got read)
      val scan = pruned.queryExecution.executedPlan.collectLeaves()
        .collectFirst {
          case f: org.apache.spark.sql.execution.FileSourceScanExec => f
        }.get
      val rows = pruned.queryExecution.executedPlan.executeCollect()
      assert(rows.length == 3, "pruning lost rows")
      import scala.jdk.CollectionConverters._
      val wanted = java.nio.file.Files.walk(java.nio.file.Paths.get(tmp))
        .iterator().asScala
        .count { p =>
          val s = p.toString
          s.endsWith(".parquet") &&
            (s.contains("event_type=click") || s.contains("event_type=purchase"))
        }
      assert(wanted > 0)
      assert(scan.metrics("numFiles").value == wanted,
        s"read ${scan.metrics("numFiles").value} files, expected $wanted")
    } finally {
      import scala.jdk.CollectionConverters._
      val root = java.nio.file.Paths.get(tmp)
      java.nio.file.Files.walk(root).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }
}
