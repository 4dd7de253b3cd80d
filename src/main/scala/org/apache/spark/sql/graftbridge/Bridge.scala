package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 made `Column` implementation-
  * agnostic and gated the conversion behind `private[sql]`
  * ExpressionUtils; third-party expression libraries reach it via an
  * `org.apache.spark.sql` subpackage (the standard extension-library
  * idiom for the classic engine).
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
