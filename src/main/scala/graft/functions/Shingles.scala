package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
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

  // a NULL token array yields an EMPTY shingle array, exactly like the HOF
  // form (`when(size(t) >= 3, ...).otherwise(array())` — size(NULL) is
  // NULL, the when falls through to otherwise)
  override def nullable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) TextShingles.emptyArray
    else TextShingles.shingles3(v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    ev.copy(
      code = childGen.code +
        code"""
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = ${childGen.isNull} ?
          graft.functions.TextShingles.emptyArray() :
          graft.functions.TextShingles.shingles3(${childGen.value});""",
      isNull = FalseLiteral)
  }

  override def prettyName: String = "shingles3"

  override protected def withNewChildInternal(newChild: Expression): Shingles3 =
    copy(child = newChild)
}

/** ALL word 3-gram shingles of a token array in POSITION order, duplicates
  * kept — the positional companion of [[Shingles3]] for span-level analyses
  * (d15 longest-duplicated-run) where the i-th output element IS the shingle
  * starting at token i. Same codegen'd one-loop shape; docs with < 3 tokens
  * yield an empty array.
  */
case class Shingles3Pos(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingles3_pos expects array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) TextShingles.emptyArray
    else TextShingles.shingles3Pos(v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    ev.copy(
      code = childGen.code +
        code"""
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = ${childGen.isNull} ?
          graft.functions.TextShingles.emptyArray() :
          graft.functions.TextShingles.shingles3Pos(${childGen.value});""",
      isNull = FalseLiteral)
  }

  override def prettyName: String = "shingles3_pos"

  override protected def withNewChildInternal(newChild: Expression): Shingles3Pos =
    copy(child = newChild)
}

object TextShingles {

  private val SEP = UTF8String.fromString(" ")
  private val EMPTY = new GenericArrayData(Array.empty[Any])

  def emptyArray(): ArrayData = EMPTY

  def shingles3(tokens: ArrayData): ArrayData = {
    val n = tokens.numElements()
    if (n < 3) return EMPTY
    // extract once — getUTF8String per window would re-read 3× per token;
    // UTF8String.concatWs skips null inputs, matching concat_ws
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      toks(i) = if (tokens.isNullAt(i)) null else tokens.getUTF8String(i)
      i += 1
    }
    val seen = new java.util.LinkedHashSet[UTF8String](n * 2)
    i = 0
    while (i + 2 < n) {
      seen.add(UTF8String.concatWs(SEP, toks(i), toks(i + 1), toks(i + 2)))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }

  def shingles3Pos(tokens: ArrayData): ArrayData = {
    val n = tokens.numElements()
    if (n < 3) return EMPTY
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      toks(i) = if (tokens.isNullAt(i)) null else tokens.getUTF8String(i)
      i += 1
    }
    val out = new Array[AnyRef](n - 2)
    i = 0
    while (i + 2 < n) {
      out(i) = UTF8String.concatWs(SEP, toks(i), toks(i + 1), toks(i + 2))
      i += 1
    }
    new GenericArrayData(out)
  }
}
