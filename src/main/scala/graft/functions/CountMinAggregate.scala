package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  DataInputStream, DataOutputStream}
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch as a second custom [[TypedImperativeAggregate]] —
  * the OVERestimating counterpart of the Misra-Gries underestimator
  * ([[HeavyHittersAgg]]): a depth×width counter matrix answering
  * "about how often did key x occur" for EVERY key, in fixed memory,
  * mergeable by element-wise addition (partials combine across
  * partitions and across streaming micro-batches identically).
  * Guarantees: est ≥ true count always; est ≤ true + εN with
  * probability 1−δ for width = ⌈e/ε⌉, depth = ⌈ln 1/δ⌉.
  *
  * Hashing contract: row r of the matrix buckets key k at
  * `parseLong(md5(k + ":" + r)[0,8), 16) mod width` — deliberately
  * md5-derived (not xxhash64) so ANY engine can replay the sketch
  * cell-for-cell: the same formula is expressible as
  * `conv(substring(md5(...), 1, 8), 16, 10) % width` in Spark SQL and
  * DuckDB, which makes even the COLLISIONS deterministic and the
  * estimates hash-comparable across engines — an oracle-able sketch.
  *
  * Output: array<array<long>> (depth rows of width counters).
  * [[SketchFunctions.countMinEstimate]] is the matching declarative
  * lookup.
  */
case class CountMinAgg(child: Expression, depth: Int, width: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(depth > 0 && width > 0, s"bad sketch shape $depth x $width")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(ArrayType(LongType))

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      var r = 0
      while (r < depth) {
        buf(r * width + CountMinAgg.bucket(s, r, width)) += 1L
        r += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData((0 until depth).map(r =>
      new GenericArrayData(buf.slice(r * width, (r + 1) * width))))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    buf.foreach(out.writeLong)
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    Array.fill(depth * width)(in.readLong())
  }

  override def withNewMutableAggBufferOffset(offset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CountMinAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountMinAgg =
    copy(child = newChildren.head)
}

object CountMinAgg {
  // held statically (never serialized with the expression tree); one
  // digest per thread, reused across rows
  private val md5Local: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Row-r bucket of `key`: first 8 md5 hex chars of "key:r" mod
    * width — the formula [[CountMinFunctions.cmsBucket]] mirrors. */
  def bucket(key: String, row: Int, width: Int): Int = {
    val d = md5Local.get()
    d.reset()
    val hex = d.digest(s"$key:$row".getBytes("UTF-8"))
      .take(4).map(b => f"$b%02x").mkString
    (java.lang.Long.parseLong(hex, 16) % width).toInt
  }
}

object CountMinFunctions {

  import org.apache.spark.sql.functions._

  /** Column API: `countMin(keyCol, depth, width)` →
    * array<array<long>>. */
  def countMin(key: Column, depth: Int, width: Int): Column = {
    import org.apache.spark.sql.GraftExpressionBridge._
    column(CountMinAgg(expression(key), depth, width)
      .toAggregateExpression())
  }

  /** The declarative row-r bucket of a key — the exact arithmetic the
    * aggregate uses, as codegen'd Columns (and as portable SQL). */
  def cmsBucket(key: Column, row: Int, width: Int): Column =
    conv(substring(md5(concat(key.cast("string"), lit(s":$row"))), 1, 8),
      16, 10).cast("long") % width

  /** Point estimate of `key` from a sketch column: min over rows of
    * the key's bucket counter. */
  def countMinEstimate(sketch: Column, key: Column, depth: Int,
      width: Int): Column =
    least((0 until depth).map(r =>
      element_at(element_at(sketch, r + 1),
        (cmsBucket(key, r, width) + 1).cast("int"))): _*)
}
