/* Test-only bridge into the private[sql] SparkSessionExtensions surface —
 * lets the suite exercise the registry build a cluster performs at session
 * construction (spark.sql.extensions) without tearing down the shared test
 * session.
 */
package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry

object testbridge {
  def registerFunctions(ext: SparkSessionExtensions,
                        reg: FunctionRegistry): FunctionRegistry =
    ext.registerFunctions(reg)
}
