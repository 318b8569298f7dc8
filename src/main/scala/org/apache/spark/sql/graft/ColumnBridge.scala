package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Registry-free Expression→Column wrap (`ExpressionUtils.column` is
  * private[sql]). The session-function registry route (`call_function`,
  * the GeoClip/BpeEncode discipline) needs an explicit `register(spark)`
  * at every entry point; library-level scalar chains like
  * [[graft.text.WebText.htmlText]] are built WITHOUT a session at hand,
  * so their native expressions wrap directly. Same justified
  * package-escape shape as [[org.apache.spark.graft.ListenerDrain]].
  */
object ColumnBridge {
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
}
