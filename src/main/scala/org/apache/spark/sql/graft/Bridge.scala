package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal accessor for Spark's private[sql] Column <-> Expression bridge
  * (Spark 4.x moved Column onto ColumnNode; ExpressionUtils is the sanctioned
  * internal converter). Keeping this one file inside the org.apache.spark.sql
  * namespace confines the private-API surface to a single place. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
