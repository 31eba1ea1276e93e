package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for graft's native Catalyst expressions.
  *
  * Spark 4 made the `Column` ⇄ `Expression` converters `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`, columnNodeSupport.scala)
  * when `Column` moved to connect-compatible `ColumnNode`s. Libraries that
  * ship their own codegen expressions use the package-qualified-access
  * pattern below: one object inside the `org.apache.spark.sql` namespace
  * re-exporting exactly the two converters. This is the only file in the
  * repo outside the `graft` namespace; everything else goes through it.
  */
object ColumnBridge {
  /** Wrap a Catalyst expression as a user-facing Column. */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Unwrap a Column to its Catalyst expression (classic sessions only). */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
