package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Bridge into the `org.apache.spark.sql` package: build a [[Column]]
 * directly from a native Catalyst [[Expression]] node (and read one back).
 *
 * Spark 4's classic `ExpressionUtils` is `private[sql]`, so a library
 * outside the package can otherwise only reach its own expression nodes
 * through the session function registry (`call_function` after
 * registration) — which makes plan shape depend on WHICH session the
 * builder thread has active. This shim removes that dependency: the
 * graft native expressions ([[graft.functions.TextFunctions]],
 * [[graft.functions.VectorFunctions]]) construct session-free Columns,
 * and registration remains only for SQL-name access.
 */
object ColumnBridge {
  /** Column wrapping a native Catalyst expression node. */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** The Catalyst expression behind a (classic) Column. */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
