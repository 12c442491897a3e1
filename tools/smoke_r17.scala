// r17 smoke: sql11/sql12/sql13 verbs + narrowed Louvain family timing.
import org.apache.spark.sql.functions._
val dir = "/root/testdata/sf0.001"

def timeIt[T](tag: String)(f: => T): T = {
  val t0 = System.nanoTime(); val r = f
  println(f"[smoke] $tag: ${(System.nanoTime - t0) / 1e9}%.1f s"); r
}

// sql12: Spark-SQL portable graph must equal SyntheticGraph.portable
val scalaEdges = graft.sources.SyntheticGraph.portable(spark, 600, 250, "g15")
def ep(tag: String) =
  "pmod(cast(conv(substr(md5(concat_ws(':', cast(id AS string), " +
    s"'$tag', 'g15')), 1, 8), 16, 10) AS bigint), 600)"
val sqlEdges = spark.sql(
  s"SELECT ${ep("s")} AS src, ${ep("d")} AS dst FROM range(250)")
val diff = scalaEdges.exceptAll(sqlEdges).count() + sqlEdges.exceptAll(scalaEdges).count()
println(s"[smoke] portable-graph diff rows = $diff (want 0)")

// sql11 == g6
val g6 = graft.SparkEntry.queries("g6_pagerank_converged")(spark, dir)
val s11 = graft.SparkEntry.queries("sql11_pagerank")(spark, dir)
println(s"[smoke] sql11 vs g6 diff = ${g6.exceptAll(s11).count() + s11.exceptAll(g6).count()} (want 0); rows=${s11.count()}")

// sql12 == g15
val g15 = graft.SparkEntry.queries("g15_components")(spark, dir)
val s12 = graft.SparkEntry.queries("sql12_components")(spark, dir)
println(s"[smoke] sql12 vs g15 diff = ${g15.exceptAll(s12).count() + s12.exceptAll(g15).count()} (want 0); rows=${s12.count()}")

// sql13 == p16
val p16 = graft.SparkEntry.queries("p16_incremental_gold")(spark, dir)
val s13 = graft.SparkEntry.queries("sql13_changes_consumer")(spark, dir)
println(s"[smoke] sql13 vs p16 diff = ${p16.exceptAll(s13).count() + s13.exceptAll(p16).count()} (want 0); rows=${s13.count()}")

// grammar loud failures
def expectFail(tag: String)(f: => Any): Unit =
  try { f; println(s"[smoke] $tag: NO ERROR (BAD)") }
  catch { case e: Throwable => println(s"[smoke] $tag: failed loudly OK (${e.getMessage.take(60)})") }
expectFail("pagerank-no-src") {
  graft.GraftSql.exec(spark, dir, "PAGERANK USING SELECT 1 AS a").collect()
}
expectFail("pagerank-bad-opt") {
  graft.GraftSql.exec(spark, dir, "PAGERANK WIBBLE 3 USING SELECT 1 AS src, 2 AS dst").collect()
}
expectFail("components-bad") {
  graft.GraftSql.exec(spark, dir, "COMPONENTS FRM LAKE 'x'").collect()
}

// temp view leak check
val before = spark.catalog.listTables().filter(col("name").startsWith("graft_lake_ref_")).count()
println(s"[smoke] leaked lake-ref views = $before (want 0)")

// Louvain family at narrowed width — values must match r16 hashes, so
// compare a quick projection against the old結果 via the oracle queries later;
// here just time and sanity-count.
for (q <- Seq("g52b_louvain_multilevel", "g58_louvain_warm",
              "g58b_louvain_warm_ladder", "g52c_louvain_converged",
              "g58c_louvain_warm_converged")) {
  timeIt(q) {
    val df = graft.SparkEntry.queries(q)(spark, dir)
    df.write.format("noop").mode("overwrite").save()
  }
}
println("[smoke] done")
System.exit(0)
