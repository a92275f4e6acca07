package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy hitters as a custom
  * [[TypedImperativeAggregate]] — the remaining Catalyst extension
  * point (custom aggregation buffer) demonstrated with a real
  * bounded-memory streaming summary.
  *
  * The buffer holds at most `k` (token → count) entries. Guarantees
  * (hold under ANY partitioning/merge order): every token with true
  * frequency > N/(k+1) is present, and each reported count is an
  * underestimate by at most N/(k+1). Exact token top-k needs a full
  * groupBy shuffle of the whole vocabulary; this is one bounded buffer
  * per partition merged on the driver side of the aggregation — the
  * only choice when the vocabulary itself doesn't fit.
  *
  * Output is a map<string, long> of surviving tokens to lower-bound
  * counts. NOTE: exact buffer CONTENTS near the frequency threshold are
  * merge-order dependent (inherent to MG); the guarantees above are
  * not, and the spec asserts the guarantees.
  */
case class HeavyHittersAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = MapType(StringType, LongType)

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  private def shrink(buf: mutable.HashMap[String, Long]): Unit =
    if (buf.size > k) {
      // subtract the (k+1)-th largest count; drop non-positives
      val thresh = buf.values.toSeq.sorted(Ordering[Long].reverse)(k)
      val dead = mutable.ArrayBuffer[String]()
      buf.keysIterator.foreach { key =>
        val c = buf(key) - thresh
        if (c <= 0) dead += key else buf(key) = c
      }
      dead.foreach(buf.remove)
    }

  override def update(buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      if (buf.contains(s) || buf.size < k) {
        buf.update(s, buf.getOrElse(s, 0L) + 1L)
      } else {
        // classic Misra-Gries step: a new key with a full buffer
        // decrements every counter (O(k), no sort on the hot path)
        val dead = mutable.ArrayBuffer[String]()
        buf.keysIterator.foreach { key =>
          val c = buf(key) - 1L
          if (c <= 0) dead += key else buf(key) = c
        }
        dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(b1: mutable.HashMap[String, Long],
      b2: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b2.foreach { case (s, c) => b1.update(s, b1.getOrElse(s, 0L) + c) }
    shrink(b1)
    b1
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    // deterministic map order: by count desc, then token
    val entries = buf.toSeq.sortBy { case (s, c) => (-c, s) }
    new ArrayBasedMapData(
      new GenericArrayData(entries.map(e => UTF8String.fromString(e._1))),
      new GenericArrayData(entries.map(_._2)))
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, c) =>
      val b = s.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    (1 to n).foreach { _ =>
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      buf.update(new String(b, "UTF-8"), in.readLong())
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): HeavyHittersAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HeavyHittersAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HeavyHittersAgg =
    copy(child = newChildren.head)
}

object SketchFunctions {

  /** Column API: `heavyHitters(tokenCol, k)` → map<token, count_lb>. */
  def heavyHitters(tokens: org.apache.spark.sql.Column,
      k: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.GraftExpressionBridge._
    column(HeavyHittersAgg(expression(tokens), k)
      .toAggregateExpression())
  }
}
