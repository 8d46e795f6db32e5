package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Glue into Spark's `private[sql]` Column↔Expression bridge — the standard
  * pattern for extension libraries that ship native Catalyst expressions
  * (the public `Column` API in Spark 4 wraps `ColumnNode`, not
  * `Expression`; `classic.ExpressionUtils` does the conversion). Kept to
  * one function so the private-API surface is a single line. */
package object graftglue {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
