package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k state: at most `k` (score, id) pairs, kept best-first
  * under the ranking (score DESC, id ASC). Backed by a min-heap whose
  * head is the WORST kept entry — each insert is O(log k) and the state
  * never exceeds k entries, which is the entire point: as an aggregation
  * buffer it caps what a partial aggregate ships through the exchange.
  */
final class TopKState(val k: Int) {
  // "max" under this ordering = the worst kept pair (lowest score, then
  // largest id) = the entry the next better candidate evicts
  private val worstFirst: Ordering[(Double, Long)] =
    new Ordering[(Double, Long)] {
      def compare(a: (Double, Long), b: (Double, Long)): Int = {
        val c = java.lang.Double.compare(b._1, a._1)
        if (c != 0) c else java.lang.Long.compare(a._2, b._2)
      }
    }
  private val heap = mutable.PriorityQueue.empty[(Double, Long)](worstFirst)

  def insert(score: Double, id: Long): Unit = {
    if (heap.size < k) heap.enqueue((score, id))
    else if (worstFirst.compare((score, id), heap.head) < 0) {
      heap.dequeue()
      heap.enqueue((score, id))
    }
  }

  def mergeFrom(other: TopKState): Unit =
    other.heap.foreach { case (s, i) => insert(s, i) }

  /** Best-first (score DESC, id ASC) — the window form's output order.
    * Under `worstFirst`, "least" IS the best entry, so the plain
    * ascending sort is already best-first.
    */
  def sorted: Array[(Double, Long)] = heap.toArray.sorted(worstFirst)

  def serialize(): Array[Byte] = {
    val arr = heap.toArray
    val bb = ByteBuffer.allocate(4 + arr.length * 16)
    bb.putInt(arr.length)
    arr.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }
}

object TopKState {
  def deserialize(k: Int, bytes: Array[Byte]): TopKState = {
    val st = new TopKState(k)
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    var i = 0
    while (i < n) { st.insert(bb.getDouble, bb.getLong); i += 1 }
    st
  }
}

/** Native bounded top-k aggregate: `graft_topk(score, id, k)` returns the
  * k best `(vec_id, cos_sim)` structs under (score DESC, id ASC) — the
  * ranking [[graft.operators.Similarity.knnBatch]]'s window uses.
  *
  * Why an aggregate and not the window: `row_number() OVER (PARTITION BY
  * probe ORDER BY ...)` must ship EVERY scored candidate through the
  * exchange and sort it, so the shuffled volume is |candidates|·|probes|.
  * This TypedImperativeAggregate holds a k-bounded heap as its partial
  * state, so the map side reduces each (probe, partition) to ≤ k pairs
  * before the exchange — the shuffle carries k·|partitions| rows per
  * probe regardless of corpus size, which is the shape that survives
  * thousands of probes over 100 TB. (A `collect_list`-then-slice
  * composition would NOT do this: its partial state is unbounded.)
  *
  * Determinism: insertion order cannot affect the result — the kept set
  * under a total order is insertion-order-free (ties are broken by id,
  * and (score, id) pairs are unique per group by construction), and
  * `eval` emits the set fully sorted. NULL score or id contributes
  * nothing (the window form never ranks them into the top-k either —
  * scores here are non-null rounded similarities).
  */
case class TopKAggExpr(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKState] {

  require(k > 0, s"k must be positive, got $k")

  override def children: Seq[Expression] = Seq(score, id)

  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, id.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (s, i) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects (DOUBLE score, BIGINT id), got " +
            s"${s.simpleString(10)} and ${i.simpleString(10)}")
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("cos_sim", DoubleType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_topk"

  override def createAggregationBuffer(): TopKState = new TopKState(k)

  override def update(buf: TopKState, input: InternalRow): TopKState = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKState, other: TopKState): TopKState = {
    buf.mergeFrom(other)
    buf
  }

  override def eval(buf: TopKState): Any =
    new GenericArrayData(buf.sorted.map { case (s, i) =>
      new GenericInternalRow(Array[Any](i, s))
    })

  override def serialize(buf: TopKState): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): TopKState =
    TopKState.deserialize(k, bytes)

  override def withNewMutableAggBufferOffset(off: Int): TopKAggExpr =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): TopKAggExpr =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1))
}
