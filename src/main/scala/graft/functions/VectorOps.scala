package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Codegen'd vector kernels for the similarity tier. The declarative HOF
  * forms (`aggregate(zip_with(...))`, `transform(sequence...)`) execute
  * through interpreted per-element lambdas — measured as the dominant cost
  * of every ANN/near-dup query at sf0.1 (same lesson as Shingles3). These
  * loops keep the arithmetic IDENTICAL (the DuckDB oracles mirror the
  * formulas, not the execution), so results are bit-equal.
  */

/** Integer dot product of two long arrays — NULL on length mismatch or a
  * null element, matching the `aggregate(zip_with(...))` form it replaced
  * (zip_with null-pads the short side and the null poisons the sum), so a
  * corrupt/truncated vector drops out of top-k instead of ranking with a
  * plausible partial score.
  */
case class DotLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"dot_long expects two array<bigint>, got $other")
    }

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dotLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Long ${ev.value}Boxed = graft.functions.VectorOps.dotLong($a, $b);
      if (${ev.value}Boxed == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}Boxed.longValue(); }
    """)

  override def prettyName: String = "dot_long"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotLong =
    copy(left = newLeft, right = newRight)
}

/** The n projections of a quantized vector onto the deterministic ±1
  * direction family `sign(p, i) = ((((p·131071 + i + 1)·HashMul + salt)
  * mod 2³²) >> 16) & 1 ? 1 : -1` — one Java loop instead of n interpreted
  * HOF dot products. Used as LSH sign bits (proj > 0) and IVF anchor dots.
  */
case class SignProjections(child: Expression, n: Int, salt: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sign_projections expects array<bigint>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    VectorOps.signProjections(input.asInstanceOf[ArrayData], n, salt)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.VectorOps.signProjections($c, $n, ${salt}L)")

  override def prettyName: String = "sign_projections"

  override protected def withNewChildInternal(newChild: Expression): SignProjections =
    copy(child = newChild)
}

object VectorOps {

  /** Knuth multiplicative hash constants — the single source of truth for
    * the ±1 sign families (Similarity re-exports them; SimOracles renders
    * the same digits into DuckDB SQL).
    */
  final val HashMul = 2654435761L
  final val HashMod = 4294967296L

  def dotLong(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }

  def signProjections(q: ArrayData, n: Int, salt: Long): ArrayData = {
    val dim = q.numElements()
    val v = new Array[Long](dim)
    var i = 0
    while (i < dim) { v(i) = if (q.isNullAt(i)) 0L else q.getLong(i); i += 1 }
    val out = new Array[Any](n)
    var p = 0
    while (p < n) {
      var acc = 0L
      i = 0
      while (i < dim) {
        val h = ((p * 131071L + i + 1L) * HashMul + salt) % HashMod
        acc += (if (((h >> 16) & 1L) == 1L) v(i) else -v(i))
        i += 1
      }
      out(p) = acc
      p += 1
    }
    new GenericArrayData(out)
  }
}
