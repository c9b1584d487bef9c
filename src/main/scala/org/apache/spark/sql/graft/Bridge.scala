package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ catalyst Expression bridge for graft's custom expressions.
  *
  * Spark 4 moved `Column` to sql-api (ColumnNode-backed) and made the
  * classic converters `private[sql]`, so a library that ships its own
  * Catalyst expressions needs this one-hop shim inside the sql package
  * namespace — the standard pattern for Spark-native extension libraries.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
