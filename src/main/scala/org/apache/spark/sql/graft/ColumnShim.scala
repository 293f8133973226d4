package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between public `Column`s and catalyst `Expression`s.
  * `ExpressionUtils` is `private[sql]`, so this one-file shim lives in an
  * `org.apache.spark.sql` subpackage — the standard extension-library
  * technique for exposing a native expression through the public Column
  * API without forking Spark.
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
