package graft.operators

import org.apache.spark.sql.DataFrame

/** Deterministic cache lifetimes for multi-stage operator pipelines.
  *
  * The LSH/ANN/TF-IDF pipelines persist intermediates (signature
  * matrices, token sets, IVF assignments) because Catalyst would
  * otherwise inline the expensive projection into both sides of a
  * self-join (measured 50-100× slowdowns). But a `persist` held through
  * the CacheManager lives until an explicit `unpersist` — returning a
  * lazy frame that depends on the cache means the operator can never
  * release it, and a long-lived session accumulates dead cache blocks.
  *
  * [[sealAfter]] resolves the tension: materialize the (small, final)
  * result eagerly via `localCheckpoint`, then drop every intermediate.
  * The returned frame is self-contained — consumers can run any number
  * of actions without recomputation — and the checkpoint blocks
  * themselves are lifecycle-managed by Spark's ContextCleaner (freed
  * when the frame is garbage-collected), not parked in the CacheManager
  * forever. The cost is that pipeline operators become EAGER (one job
  * runs at call time), which is the right trade for pipeline terminals
  * whose output is orders of magnitude smaller than their inputs.
  * On a real cluster, swap `localCheckpoint` for reliable `checkpoint`
  * if the result must survive executor loss beyond the consuming job.
  */
private[graft] object CacheScope {

  /** Eagerly materialize `result`, then unpersist `intermediates`.
    * After this returns, the operator has left nothing in the
    * CacheManager.
    */
  def sealAfter(result: DataFrame, intermediates: DataFrame*): DataFrame = {
    val out = result.localCheckpoint() // eager: materializes in this job
    intermediates.foreach(_.unpersist(false))
    out
  }

  /** The LOOP-STATE rotation: eager localCheckpoint (cuts lineage,
    * materializes for the round's driver action) PLUS a statistics
    * reset. `localCheckpoint` alone preserves the origin plan's size
    * estimate, and a join-shaped round MULTIPLIES child estimates — so
    * across rounds the carried estimate's bit length DOUBLES and a
    * long fixpoint (a 39-round HashMin on a path graph) first slows
    * planning exponentially, then overflows Catalyst's BigInteger
    * range outright. Every iterative loop's carried state must rotate
    * through this instead of bare localCheckpoint.
    */
  def rotate(state: DataFrame): DataFrame =
    org.apache.spark.sql.classic.GraftSqlBridge
      .resetStats(state.localCheckpoint())
}
