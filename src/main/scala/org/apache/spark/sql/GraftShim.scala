package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge for custom Catalyst expressions: Spark 4 gates the
  * Expression↔Column conversions behind `private[sql]`
  * (`classic.ExpressionUtils`), so extensions that build native
  * expressions need this one-file shim inside the sql package — the
  * same technique Spark's own connectors use. */
object GraftShim {
  def column(e: Expression): Column =
    classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
}
