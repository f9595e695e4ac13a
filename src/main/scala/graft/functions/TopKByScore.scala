// Lives under org.apache.spark.sql (like CosineSimilarity) for the
// private[sql] catalyst aggregate APIs.
package org.apache.spark.sql.graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded-heap per-group top-k: `top_k_by(score, id, k)` →
  * ARRAY<STRUCT<score DOUBLE, id BIGINT>> sorted score DESC, id ASC.
  *
  * A custom `TypedImperativeAggregate` (the engine-grade extension point
  * used by percentile_approx/collect_list): each partial buffer holds AT
  * MOST k entries, so per-group top-k costs one partial-agg pass + a
  * k·partitions-row merge — versus the window row_number approach, which
  * shuffles and sorts EVERY candidate row. At 100 TB fan-out this is the
  * difference between exchanging top-k·tasks rows and exchanging the whole
  * scored relation (SURVEY.md §8 scale notes; used by s03_knn_heap, whose
  * oracle is identical to the window-based s01).
  *
  * Determinism: selection and output order use exact (score DESC, id ASC)
  * comparisons — ties always resolve to the smaller id, matching the
  * window formulation bit-for-bit.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0,
) extends TypedImperativeAggregate[scala.collection.mutable.PriorityQueue[(Double, Long)]]
    with ExpectsInputTypes {

  require(k > 0, "top_k_by: k must be positive")

  // analysis-time type check (and implicit casts) instead of a mid-job
  // ClassCastException when SQL callers pass e.g. a float score
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType, LongType)

  // max-heap whose maximum is the WORST entry (lowest score; ties → larger
  // id), so exceeding k evicts in O(log k)
  private val worstFirst: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
    override def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(b._1, a._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }

  override def createAggregationBuffer(): scala.collection.mutable.PriorityQueue[(Double, Long)] =
    scala.collection.mutable.PriorityQueue.empty(worstFirst)

  override def update(
      buf: scala.collection.mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): scala.collection.mutable.PriorityQueue[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      buf.enqueue((s.asInstanceOf[Double], i.asInstanceOf[Long]))
      if (buf.size > k) buf.dequeue()
    }
    buf
  }

  override def merge(
      buf: scala.collection.mutable.PriorityQueue[(Double, Long)],
      other: scala.collection.mutable.PriorityQueue[(Double, Long)])
      : scala.collection.mutable.PriorityQueue[(Double, Long)] = {
    other.foreach { e =>
      buf.enqueue(e)
      if (buf.size > k) buf.dequeue()
    }
    buf
  }

  override def eval(buf: scala.collection.mutable.PriorityQueue[(Double, Long)]): Any = {
    // Double.compare is NaN-total, so the sort contract holds even when a
    // score is NaN (e.g. cosine of a zero vector) — sortWith on != / >
    // would violate it and throw on larger arrays
    val sorted = buf.toArray.sorted(worstFirst)
    new GenericArrayData(sorted.map { case (s, i) => InternalRow(s, i) })
  }

  override def serialize(buf: scala.collection.mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    buf.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): scala.collection.mutable.PriorityQueue[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    (1 to n).foreach(_ => buf.enqueue((in.readDouble(), in.readLong())))
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false),
    )),
    containsNull = false)

  override def nullable: Boolean = false

  override def children: Seq[Expression] = Seq(score, id)

  override def prettyName: String = "top_k_by"

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1))
}
