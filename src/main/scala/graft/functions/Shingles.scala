package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word 3-gram shingles of a token array, as one codegen'd Java
  * loop. The declarative form — `array_distinct(transform(sequence(...),
  * i => concat_ws(" ", t[i], t[i+1], t[i+2])))` — runs through interpreted
  * higher-order-function lambdas per element and measured ~4 s for 500k
  * shingles at sf0.1; this loop is ~10× cheaper and feeds every MinHash /
  * Jaccard tier (TextOps.shingleRows / minhashSignatures).
  *
  * Semantics are identical to the HOF form (asserted in TextOpsSpec):
  * docs with < 3 tokens yield an empty array; duplicates collapse to
  * first occurrence order.
  */
case class Shingles3(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingles3 expects array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    TextShingles.shingles3(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextShingles.shingles3($c)")

  override def prettyName: String = "shingles3"

  override protected def withNewChildInternal(newChild: Expression): Shingles3 =
    copy(child = newChild)
}

object TextShingles {

  private val SPACE = Array[Byte](' ')

  def shingles3(tokens: ArrayData): ArrayData = {
    val n = tokens.numElements()
    if (n < 3) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String](n * 2)
    var i = 0
    while (i + 2 < n) {
      // concat_ws(" ", a, b, c) with null tokens treated as the HOF form
      // does (concat_ws skips nulls)
      val parts = new java.util.ArrayList[UTF8String](3)
      var j = i
      while (j <= i + 2) {
        if (!tokens.isNullAt(j)) parts.add(tokens.getUTF8String(j))
        j += 1
      }
      seen.add(UTF8String.concatWs(UTF8String.fromBytes(SPACE),
        parts.toArray(new Array[UTF8String](parts.size)): _*))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }
}
