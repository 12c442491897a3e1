// Louvain per-round overhead experiment (round 17): is the tiny-fixture
// cost driven by 32-partition task scheduling? Times the g52c/g58c
// computations at shuffle.partitions = 32 (bench setting) vs 1 vs 4.
// Run: spark-shell --jars <graft jar> -I tools/louvain_timing.scala
import org.apache.spark.sql.functions._

def timeIt[T](tag: String)(f: => T): T = {
  val t0 = System.nanoTime(); val r = f
  println(f"[exp] $tag: ${(System.nanoTime - t0) / 1e9}%.1f s"); r
}

val e = graft.sources.SyntheticGraph.portableBlocks(spark, 200, 600, "g22b")

// warm the JIT/codegen paths once
graft.operators.Louvain.moveRounds(e, 1)

for (p <- Seq("32", "1", "4")) {
  spark.conf.set("spark.sql.shuffle.partitions", p)
  timeIt(s"parts=$p multilevelConverged(8,12)") {
    val (lab, lv) = graft.operators.Louvain.multilevelConverged(e, 8, 12)
    println(s"[exp]   levels=$lv rows=${lab.count()}")
  }
  timeIt(s"parts=$p moveRoundsWeighted(prior,4)") {
    val we = graft.operators.Louvain.fromEdges(e)
    val weOld = we.filter((col("u") + col("v")) % 5 =!= 0)
    graft.operators.Louvain.moveRoundsWeighted(weOld, 4).count()
  }
}
println("[exp] done")
System.exit(0)
