package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression,
  XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Row-local MinHash LSH band hashes as ONE codegen'd pass — the
  * production fast path for streaming ingest gates
  * ([[graft.streaming.DocsStream.streamingNearDupGate]] documents the
  * portable md5 family as the oracle-replayable tier; this is its
  * xxhash64 twin for the hot path, the same split the batch pipeline
  * already makes between `minhashPairsPortable` and
  * `minhashSignatures`).
  *
  * Family (hash-of-hash, the [[graft.operators.Dedup.minhashSignature]]
  * convention): each shingle is hashed ONCE
  * (h0 = XXH64(utf8 bytes, seed 42) — the same primitive Spark's
  * `xxhash64` builtin uses), then permutation i is one 8-byte mix
  * `XXH64.hashLong(h0, seed = i)`; slot i = min over shingles; band b's
  * key = `XXH64.hashLong`-fold over its r slots (seed 42). Cost per
  * document: n string hashes + n·k long mixes, zero allocations beyond
  * the k-slot buffer — versus the interpreted HOF form's per-shingle
  * lambda dispatch ×k. The call sits behind `defineCodeGen`, so it
  * stays inside the scan stage's whole-stage codegen like
  * [[DeflateLen]].
  *
  * Not cross-engine replayable (no DuckDB xxhash64) — value-pinned by
  * spec against a literal Scala replay, with LSH semantics (planted
  * near-dups collide, disjoint docs don't) asserted on the corpus. */
case class MinHashBands(child: Expression, k: Int, bands: Int)
    extends UnaryExpression {

  require(bands > 0 && k % bands == 0,
    s"bands must divide k: k=$k bands=$bands")

  override def dataType: DataType = ArrayType(LongType, false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"minhash_bands requires array<string>, got $other")
    }

  override protected def nullSafeEval(v: Any): Any =
    MinHashBands.compute(v.asInstanceOf[ArrayData], k, bands)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinHashBands.compute($c, $k, $bands)")

  override def prettyName: String = "minhash_bands"

  override protected def withNewChildInternal(newChild: Expression)
      : MinHashBands = copy(child = newChild)
}

object MinHashBands {

  /** One pass: per-shingle base hash, k permutation minima, banded
    * fold. Empty input → empty array (callers filter, as with the
    * portable family). */
  def compute(shingles: ArrayData, k: Int, bands: Int): ArrayData = {
    val n = shingles.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Long])
    val slots = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val s = shingles.getUTF8String(j)
      val h0 = XXH64.hashUTF8String(s, 42L)
      var i = 0
      while (i < k) {
        val h = XXH64.hashLong(h0, i.toLong)
        if (h < slots(i)) slots(i) = h
        i += 1
      }
      j += 1
    }
    val r = k / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = 42L
      var i = 0
      while (i < r) {
        acc = XXH64.hashLong(slots(b * r + i), acc)
        i += 1
      }
      out(b) = acc
      b += 1
    }
    new GenericArrayData(out)
  }
}

object MinHashBandFunctions {
  import org.apache.spark.sql.{Column, GraftExpressionBridge => B}

  def minhashBands(shingles: Column, k: Int = 64,
      bands: Int = 16): Column =
    B.column(MinHashBands(B.catalystExpression(shingles), k, bands))
}
