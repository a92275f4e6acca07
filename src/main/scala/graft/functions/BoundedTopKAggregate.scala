package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Exact bounded top-k as a custom [[TypedImperativeAggregate]]: the k
  * SMALLEST long values seen, plus the exact total input count, in one
  * pass with O(k) state per group.
  *
  * This is the aggregation shape `collect_set` + `slice` gets WRONG at
  * scale: collect_set buffers every distinct value per key before the
  * cap, so a head key (a stopword's posting list, a hot entity's event
  * ids) materializes corpus-sized state in one aggregation buffer. The
  * bounded buffer here never exceeds k elements in update OR merge, is
  * map-side combinable like any other partial aggregate, and — unlike
  * a heap-free sketch — is EXACT: k smallest values and the total
  * count are merge-order independent, so results are deterministic
  * under any partitioning.
  *
  * Output: struct(cnt: long, ids: array<long> ascending). Null inputs
  * are ignored (SQL aggregate convention).
  */
case class BoundedTopKAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BoundedTopKAgg.Buf] {

  require(k >= 1, s"k must be >= 1, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("cnt", LongType, nullable = false),
    StructField("ids", ArrayType(LongType, containsNull = false),
      nullable = false)))

  override def createAggregationBuffer(): BoundedTopKAgg.Buf =
    new BoundedTopKAgg.Buf(0L, mutable.PriorityQueue.empty[Long])

  private def offer(buf: BoundedTopKAgg.Buf, v: Long): Unit =
    if (buf.pq.size < k) buf.pq.enqueue(v)
    else if (v < buf.pq.head) { buf.pq.dequeue(); buf.pq.enqueue(v) }

  override def update(buf: BoundedTopKAgg.Buf,
      input: InternalRow): BoundedTopKAgg.Buf = {
    val v = child.eval(input)
    if (v != null) {
      buf.count += 1L
      offer(buf, v.asInstanceOf[Long])
    }
    buf
  }

  override def merge(b1: BoundedTopKAgg.Buf,
      b2: BoundedTopKAgg.Buf): BoundedTopKAgg.Buf = {
    b1.count += b2.count
    b2.pq.foreach(offer(b1, _))
    b1
  }

  override def eval(buf: BoundedTopKAgg.Buf): Any =
    new GenericInternalRow(Array[Any](buf.count,
      new GenericArrayData(buf.pq.toArray.sorted)))

  override def serialize(buf: BoundedTopKAgg.Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.count)
    out.writeInt(buf.pq.size)
    buf.pq.foreach(out.writeLong)
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BoundedTopKAgg.Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val count = in.readLong()
    val n = in.readInt()
    val buf = new BoundedTopKAgg.Buf(count, mutable.PriorityQueue.empty[Long])
    (1 to n).foreach(_ => buf.pq.enqueue(in.readLong()))
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): BoundedTopKAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BoundedTopKAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BoundedTopKAgg =
    copy(child = newChildren.head)
}

object BoundedTopKAgg {
  /** count + max-heap of the current k smallest (heap head = largest
    * of the kept set = next eviction candidate). */
  final class Buf(var count: Long, val pq: mutable.PriorityQueue[Long])

  /** Column API: `boundedTopK(idCol, k)` →
    * struct(cnt, ids array ascending). */
  def boundedTopK(values: org.apache.spark.sql.Column,
      k: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.GraftExpressionBridge._
    column(BoundedTopKAgg(expression(values), k).toAggregateExpression())
  }
}
