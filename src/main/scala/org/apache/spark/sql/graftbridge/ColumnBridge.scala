package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` Column↔Expression conversion (Spark 4 made
  * Column backend-agnostic; classic conversions live behind package
  * visibility). Lives under org.apache.spark.sql solely to see them —
  * the standard extension-library pattern.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** compile-time literal value of a Column, if it is one. Spark 4's
    * `expression()` returns a LAZY ColumnNodeExpression wrapper whose
    * `foldable` is false even for plain literals, so static-value checks
    * must look at the ColumnNode instead. Handles lit(v) and simple
    * foldable arithmetic/casts over literals by running the real
    * node→expression converter and evaluating when foldable. */
  def staticValue(c: Column): Option[Any] = try {
    val e = org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
    if (e.resolved && e.foldable) Option(e.eval(null)) else None
  } catch { case _: Exception => None }

  /** register an expression builder as a SQL function on a session. */
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "scala_udf")
}
