package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Catalyst Expression bridge. Spark 4 made the public Column
  * backend-agnostic and scoped the classic converters `private[sql]`;
  * an extension library that ships its own native expressions needs
  * exactly these two hops, so this object lives in an `org.apache.
  * spark.sql` subpackage to reach them — the standard pattern for
  * Spark-native extension libraries (nothing else from the internals
  * is touched). */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
