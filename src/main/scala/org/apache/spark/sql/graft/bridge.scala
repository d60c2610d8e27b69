/* Bridge into Spark's private[sql] classic helpers — the standard pattern
 * for Spark extension libraries (same technique as spark-packages that add
 * Column functions): lives in the org.apache.spark.sql namespace solely to
 * re-export Column<->Expression conversion; no Spark internals are modified.
 */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

object bridge {
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  def column(e: Expression): Column = ExpressionUtils.column(e)
}
