package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom codegen'd hash expressions for document fingerprinting — the
  * per-row hot path of dedup at corpus scale. Both stay inside whole-stage
  * codegen via static calls; no boxing, no regex, no UDF serialization.
  */

/** 64-bit SimHash over a token array: per-token FNV-1a 64 votes each bit
  * up/down; the sign pattern is the fingerprint. Near-duplicate docs land
  * within small Hamming distance — banding the 64 bits gives an LSH for
  * near-dedup that needs only a groupBy, no pairwise compare.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    TextHashes.simhash64(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashes.simhash64($c)")

  override def prettyName: String = "simhash64"

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Karp-Rabin rolling polynomial fingerprint of a string (base 256,
  * mod 2^61-1) — an order-sensitive content fingerprint (vs order-free
  * SimHash), cheap to maintain incrementally over sliding windows.
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_hash expects string, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    TextHashes.rollingHash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashes.rollingHash($c)")

  override def prettyName: String = "rolling_hash"

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object TextHashes {
  private final val FNV_OFFSET = 0xcbf29ce484222325L
  private final val FNV_PRIME = 0x100000001b3L
  /** 2^61 - 1 (Mersenne prime) */
  private final val MOD = (1L << 61) - 1

  def fnv64(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = FNV_OFFSET
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= FNV_PRIME
      i += 1
    }
    h
  }

  def simhash64(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = fnv64(tokens.getUTF8String(i))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  def rollingHash(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      // h = (h * 256 + byte) mod (2^61-1), using mersenne fold
      h = (h << 8) + (bytes(i) & 0xffL)
      h = (h & MOD) + (h >>> 61)
      if (h >= MOD) h -= MOD
      i += 1
    }
    h
  }
}
