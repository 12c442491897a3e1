package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items summary: at most `capacity` counters.
  *
  * Update (classic MG): a tracked item increments its counter; an
  * untracked item takes a free slot, or — when full — ALL counters
  * decrement by 1 and zeros drop (implemented batched: decrement by the
  * current minimum until a slot frees or the increment is absorbed).
  * Merge (Agarwal et al., "Mergeable Summaries"): sum counters
  * pairwise, then subtract the (capacity+1)-th largest value from all
  * and drop non-positives.
  *
  * Guarantee (any merge tree, any partitioning): every counter
  * undercounts its item's true frequency by at most N/(capacity+1)
  * over N total updates — so every item with true count >
  * N/(capacity+1) is PRESENT in the summary. The summary's exact
  * contents DO depend on merge order; only the no-false-negative
  * guarantee is order-free, which is why [[graft.operators.TextOps
  * .heavyHitters]] treats this as a candidate generator and re-counts
  * exactly.
  */
final class MgState(val capacity: Int) {
  val counts: mutable.HashMap[String, Long] = mutable.HashMap.empty

  def add(item: String): Unit =
    counts.get(item) match {
      case Some(c) => counts.update(item, c + 1)
      case None if counts.size < capacity => counts.update(item, 1L)
      case None =>
        // table full, item untracked: decrement ALL counters by 1, drop
        // zeros; the arrival itself is absorbed (classic MG). Amortized
        // O(1): each such round destroys `capacity` tracked count, and
        // arrivals only ever add N total, so rounds ≤ N/capacity.
        val dead = mutable.ArrayBuffer.empty[String]
        counts.mapValuesInPlace((_, c) => c - 1)
        counts.foreach { case (k, c) => if (c <= 0) dead += k }
        dead.foreach(counts.remove)
    }

  def mergeFrom(other: MgState): Unit = {
    other.counts.foreach { case (k, v) =>
      counts.update(k, counts.getOrElse(k, 0L) + v)
    }
    if (counts.size > capacity) {
      val vals = counts.values.toArray
      java.util.Arrays.sort(vals)
      val sub = vals(vals.length - capacity - 1) // (capacity+1)-th largest
      val dead = mutable.ArrayBuffer.empty[String]
      counts.mapValuesInPlace((_, c) => c - sub)
      counts.foreach { case (k, c) => if (c <= 0) dead += k }
      dead.foreach(counts.remove)
    }
  }

  /** Candidate items, sorted for a deterministic array payload. */
  def items: Array[String] = {
    val a = counts.keys.toArray
    java.util.Arrays.sort(a, Ordering[String])
    a
  }

  def serialize(): Array[Byte] = {
    val entries = counts.toArray
    val payload = entries.map { case (k, _) =>
      k.getBytes(StandardCharsets.UTF_8)
    }
    val size = 4 + payload.map(_.length + 4 + 8).sum
    val bb = ByteBuffer.allocate(size)
    bb.putInt(entries.length)
    entries.zip(payload).foreach { case ((_, c), kb) =>
      bb.putInt(kb.length); bb.put(kb); bb.putLong(c)
    }
    bb.array()
  }
}

object MgState {
  def deserialize(capacity: Int, bytes: Array[Byte]): MgState = {
    val st = new MgState(capacity)
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](bb.getInt)
      bb.get(kb)
      st.counts.update(new String(kb, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    st
  }
}

/** Native Misra-Gries candidate aggregate: `graft_mg(item, capacity)`
  * returns the ≤ capacity candidate items as a sorted string array.
  *
  * Why an aggregate and not a groupBy: the exact token→count aggregate
  * over a web-scale corpus has a VOCABULARY-sized state (tens of GB of
  * partials through the exchange); this summary's partial state is
  * capacity-bounded — each map task ships ≤ capacity counters no matter
  * how many distinct tokens it saw, and the guarantee survives Spark's
  * arbitrary partial-merge tree. NULL items contribute nothing.
  */
case class MgAggExpr(
    item: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MgState] {

  require(capacity > 0, s"capacity must be positive, got $capacity")

  override def children: Seq[Expression] = Seq(item)

  override def checkInputDataTypes(): TypeCheckResult =
    item.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects a STRING item, got ${t.simpleString(10)}")
    }

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_mg"

  override def createAggregationBuffer(): MgState = new MgState(capacity)

  override def update(buf: MgState, input: InternalRow): MgState = {
    val v = item.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: MgState, other: MgState): MgState = {
    buf.mergeFrom(other)
    buf
  }

  override def eval(buf: MgState): Any =
    new GenericArrayData(buf.items.map(s => UTF8String.fromString(s): Any))

  override def serialize(buf: MgState): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): MgState =
    MgState.deserialize(capacity, bytes)

  override def withNewMutableAggBufferOffset(off: Int): MgAggExpr =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): MgAggExpr =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(item = newChildren(0))
}
