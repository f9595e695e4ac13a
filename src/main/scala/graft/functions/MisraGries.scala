// Lives under org.apache.spark.sql (like TopKByScore) for the
// private[sql] catalyst aggregate APIs.
package org.apache.spark.sql.graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters sketch: `misra_gries(item, k)` →
  * ARRAY<STRUCT<item STRING, est BIGINT>> sorted (est DESC, item ASC).
  *
  * The buffer holds AT MOST k counters regardless of stream length, with
  * the classic deterministic guarantees (Misra & Gries 1982; merge rule
  * from Agarwal et al., "Mergeable Summaries", PODS'12):
  *
  *  - every item with true frequency  > n/(k+1) IS in the summary;
  *  - each estimate undercounts by at most n/(k+1)
  *    (true − n/(k+1) ≤ est ≤ true).
  *
  * Both bounds survive arbitrary merge trees, so the partial-aggregate
  * path (one k-entry buffer per task, merged pairwise) preserves them —
  * THE property that makes the sketch usable as a distributed aggregate:
  * per-group heavy hitters cost one narrow pass + a k·tasks-row merge
  * instead of a full word-count shuffle. Which counters survive (beyond
  * the guaranteed ones) and their exact estimates DO depend on merge
  * order, so queries gated cross-engine must emit only the
  * guarantee-derived facts (membership of true heavy hitters, bound
  * satisfaction), never raw estimates — see hh01.
  */
case class MisraGries(
    item: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0,
) extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
    with ExpectsInputTypes {

  require(k > 0, "misra_gries: k must be positive")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[String, Long], input: InternalRow): mutable.HashMap[String, Long] = {
    val v = item.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String].toString
      buf.get(key) match {
        case Some(c) => buf.update(key, c + 1)
        case None if buf.size < k => buf.update(key, 1L)
        case None =>
          // decrement-all step: one "vote" from every tracked item
          val dead = mutable.ArrayBuffer.empty[String]
          buf.keysIterator.foreach { w =>
            val c = buf(w) - 1
            if (c == 0) dead += w else buf.update(w, c)
          }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(
      buf: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (w, c) => buf.update(w, buf.getOrElse(w, 0L) + c) }
    if (buf.size > k) {
      // subtract the (k+1)-th largest count from everything, drop ≤0 —
      // the mergeable-summaries rule that preserves the n/(k+1) bound
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - (k + 1)) // (k+1)-th largest
      val dead = mutable.ArrayBuffer.empty[String]
      buf.keysIterator.foreach { w =>
        val c = buf(w) - cut
        if (c <= 0) dead += w else buf.update(w, c)
      }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val sorted = buf.toArray.sortWith { case ((wa, ca), (wb, cb)) =>
      if (ca != cb) ca > cb else wa < wb
    }
    new GenericArrayData(sorted.map { case (w, c) =>
      InternalRow(UTF8String.fromString(w), c)
    })
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    buf.foreach { case (w, c) => out.writeUTF(w); out.writeLong(c) }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    (1 to n).foreach(_ => buf.update(in.readUTF(), in.readLong()))
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false),
    )),
    containsNull = false)

  override def nullable: Boolean = false

  override def children: Seq[Expression] = Seq(item)

  override def prettyName: String = "misra_gries"

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(item = newChildren(0))
}
