// Bridge into the private[sql] Expression↔Column converters. Living in
// the org.apache.spark.sql package tree is the standard extension
// pattern for libraries that define native Catalyst expressions (the
// converters themselves are stable internals used by every Spark 4
// connector).
package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
