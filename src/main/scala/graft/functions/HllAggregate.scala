package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HyperLogLog as a fourth custom [[TypedImperativeAggregate]] — the
  * distinct-count member of the sketch family (Misra-Gries top-k /
  * Count-Min frequency / bounded top-k exact): 2^b max-rank registers,
  * mergeable by element-wise max across partitions and micro-batches.
  *
  * Hashing contract (the same oracle-ability policy as
  * [[CountMinAgg]]): the 60-bit hash is the first 15 md5 hex chars of
  * the key string — `conv(substring(md5(k), 1, 15), 16, 10)` in Spark
  * SQL, `CAST(concat('0x', substring(md5(k), 1, 15)) AS BIGINT)` in
  * DuckDB — bucket = hash mod m, rank = (60−b) − bitlength(hash div m)
  * + 1 (`bitlength` = `length(ltrim(bin(x), '0'))` in both engines).
  * Every register value, and therefore the estimate, replays exactly
  * in any engine: an oracle-able HLL, unlike the opaque built-in
  * `approx_count_distinct` sketch.
  *
  * The estimator ([[HllFunctions.hllEstimate]]) keeps the register sum
  * Σ 2^−Mj in EXACT integer arithmetic (Σ 2^(wmax−Mj) as a long,
  * wmax = 61−b ≤ 57 bits for m ≤ 2^16 terms — no float-order
  * dependence), then applies the standard alpha_m bias correction and
  * linear-counting small-range correction in a fixed double expression
  * order. Output: array<int> of m registers, bucket order.
  */
case class HllAgg(child: Expression, b: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] {

  require(b >= 4 && b <= 16, s"register exponent b must be in [4,16], got $b")
  private val m = 1 << b
  private val w = 60 - b

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def createAggregationBuffer(): Array[Int] = new Array[Int](m)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = HllAgg.hash60(v.asInstanceOf[UTF8String].toString)
      val bucket = (h % m).toInt
      val rest = h / m
      val rho = w - (64 - java.lang.Long.numberOfLeadingZeros(rest)) + 1
      if (rho > buf(bucket)) buf(bucket) = rho
    }
    buf
  }

  override def merge(b1: Array[Int], b2: Array[Int]): Array[Int] = {
    var i = 0
    while (i < m) { if (b2(i) > b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Int]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val out = new Array[Byte](m * 4)
    var i = 0
    while (i < m) {
      val v = buf(i)
      out(i * 4) = (v >> 24).toByte; out(i * 4 + 1) = (v >> 16).toByte
      out(i * 4 + 2) = (v >> 8).toByte; out(i * 4 + 3) = v.toByte
      i += 1
    }
    out
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val buf = new Array[Int](m)
    var i = 0
    while (i < m) {
      buf(i) = ((bytes(i * 4) & 0xff) << 24) | ((bytes(i * 4 + 1) & 0xff) << 16) |
        ((bytes(i * 4 + 2) & 0xff) << 8) | (bytes(i * 4 + 3) & 0xff)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): HllAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HllAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllAgg =
    copy(child = newChildren.head)
}

object HllAgg {
  private val md5Local: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** First 15 md5 hex chars of the key as a 60-bit non-negative long —
    * the JVM twin of `conv(substring(md5(k), 1, 15), 16, 10)`. */
  def hash60(key: String): Long = {
    val d = md5Local.get()
    d.reset()
    val hex = d.digest(key.getBytes("UTF-8"))
      .take(8).map(x => f"$x%02x").mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16)
  }
}

object HllFunctions {

  import org.apache.spark.sql.functions._

  /** Column API: `hll(keyCol, b)` → array<int> of 2^b registers. The
    * key is hashed in its STRING form (the md5 contract above), so any
    * input type is cast first. */
  def hll(key: Column, b: Int): Column = {
    import org.apache.spark.sql.GraftExpressionBridge._
    column(HllAgg(expression(key.cast("string")), b).toAggregateExpression())
  }

  /** Declarative register pipeline — the exact per-row arithmetic the
    * aggregate runs, as portable Columns: (bucket, rho) for a key. */
  def hllBucket(key: Column, b: Int): Column =
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10)
      .cast("long") % (1L << b)

  def hllRho(key: Column, b: Int): Column = {
    // hash div 2^b as a SHIFT — `/` would go through doubles and lose
    // low bits of the 60-bit hash
    val rest = shiftright(conv(substring(md5(key.cast("string")), 1, 15),
      16, 10).cast("long"), b)
    lit(60 - b) - length(ltrim(bin(rest), "0")) + lit(1)
  }

  /** The HLL estimate from a register array: exact-integer register
    * sum (Σ 2^(wmax−Mj), wmax = 61−b), alpha_m bias correction, and
    * linear-counting small-range correction — every operation in a
    * fixed order an oracle replays. */
  def hllEstimate(registers: Column, b: Int): Column = {
    val m = 1 << b
    val wmax = 61 - b
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    // 2^(wmax−Mj) via pow: powers of two up to 2^57 are EXACT doubles,
    // so the long cast is exact and the integer sum is order-free
    // (shiftleft won't do — its shift amount must be a literal)
    val s = aggregate(registers, lit(0L),
      (acc, x) => acc +
        pow(lit(2.0), (lit(wmax) - x).cast("double")).cast("long"))
    val v = size(filter(registers, _ === 0))
    val raw = (lit(alpha * m * m) * lit(math.pow(2.0, wmax))) /
      s.cast("double")
    when(raw <= lit(2.5 * m) && v > 0,
      lit(m.toDouble) * log(lit(m.toDouble) / v.cast("double")))
      .otherwise(raw)
  }
}
