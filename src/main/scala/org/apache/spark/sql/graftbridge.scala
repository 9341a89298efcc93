package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into private[sql] API: catalyst Expression <-> Column in
  * Spark 4 (Column wraps a ColumnNode; the converters live in
  * org.apache.spark.sql.classic.ExpressionUtils, which is
  * private[sql]). This is the sanctioned pattern for libraries adding
  * native expressions without a SparkSessionExtensions round-trip.
  */
object graftbridge {
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
}
