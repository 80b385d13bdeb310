package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.{ImperativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items sketch over a STRING column, as a typed
  * imperative aggregate (the same execution shape Spark's own
  * `approx_percentile`/HLL sketches use: an opaque buffer with
  * partial-aggregate merge, so the map side combines before any shuffle).
  *
  * Guarantees (for stream length n and capacity k, preserved under the
  * mergeable-summaries merge rule — Agarwal et al., PODS '12):
  *   - every item with true frequency > n/(k+1) is present in the output;
  *   - every estimate e(x) satisfies f(x) - n/(k+1) <= e(x) <= f(x).
  *
  * The output map is sorted by key so `eval` is deterministic for a given
  * final buffer; the buffer CONTENTS legitimately depend on partitioning
  * and arrival order (only the guarantees above are order-invariant), so
  * gated queries must expose guarantee booleans plus exact-side values,
  * never raw estimates.
  *
  * At 100 TB this replaces an exact (group, term) aggregation whose state
  * is the full vocabulary with O(k) state per group: the scan emits k
  * counters per task per group, and only those cross the wire.
  */
case class MisraGries(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0,
) extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]]
    with UnaryLike[Expression] {

  require(k >= 1 && k <= 65536, s"graft_freq_items capacity must be in [1, 65536], got $k")

  override def prettyName: String = GraftFunctions.FreqItemsName
  override def nullable: Boolean = false
  override def dataType: DataType = MapType(StringType, LongType, valueContainsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[UTF8String, Long],
      input: InternalRow,
  ): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String]
      buf.get(item) match {
        case Some(c) => buf.update(item, c + 1L)
        case None if buf.size < k =>
          // clone: the incoming UTF8String may view reused row memory
          buf.update(item.clone(), 1L)
        case None =>
          // classic MG step: the unseen item and one unit of every
          // counter annihilate each other
          val dead = buf.iterator.collect { case (key, 1L) => key }.toArray
          buf.mapValuesInPlace((_, c) => c - 1L)
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(
      buf: mutable.HashMap[UTF8String, Long],
      other: mutable.HashMap[UTF8String, Long],
  ): mutable.HashMap[UTF8String, Long] = {
    other.foreach { case (key, c) =>
      buf.update(key, buf.getOrElse(key, 0L) + c)
    }
    if (buf.size > k) {
      // subtract the (k+1)-th largest counter from all, drop <= 0 —
      // the merge that keeps the n/(k+1) error bound (and <= k entries)
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val m = counts(counts.length - (k + 1))
      val dead = buf.iterator.collect { case (key, c) if c <= m => key }.toArray
      buf.mapValuesInPlace((_, c) => c - m)
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val entries = buf.toArray.sortWith((a, b) => a._1.compareTo(b._1) < 0)
    new ArrayBasedMapData(
      new GenericArrayData(entries.map(_._1.asInstanceOf[Any])),
      new GenericArrayData(entries.map(_._2.asInstanceOf[Any])),
    )
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    buf.foreach { case (key, c) =>
      val b = key.getBytes
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
    }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(storage: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(storage))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGries =
    copy(child = newChild)
}
