package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge for expressions the function registry
  * cannot build — e.g. [[graft.expressions.BroadcastRef]], whose
  * defining argument is a [[org.apache.spark.broadcast.Broadcast]]
  * handle, not a child expression, so no `Seq[Expression] => Expression`
  * builder can produce it. Spark 4 moved this conversion behind
  * `private[sql] classic.ExpressionUtils`; this one-liner re-exports it
  * from an `org.apache.spark.sql` subpackage (the sanctioned-by-
  * convention extension seam — same access scope the built-in
  * connectors use). Nothing else from the private surface is touched.
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
}
