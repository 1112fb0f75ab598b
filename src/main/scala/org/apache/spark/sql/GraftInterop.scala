package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between public `Column`s and Catalyst `Expression`s.
  *
  * Spark 4 made `classic.ExpressionUtils` private[sql]; libraries that ship
  * custom expressions (graft.expressions) conventionally expose this tiny
  * shim from inside the `org.apache.spark.sql` package. It contains no
  * logic — just the two access-widening forwarders.
  */
object GraftInterop {
  def column(e: Expression): Column    = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
