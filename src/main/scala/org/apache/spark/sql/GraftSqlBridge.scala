package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` surface — the standard pattern for Spark
  * extension libraries that add native Catalyst expressions (public
  * Spark API: SparkSessionExtensions does the same wiring, but column
  * construction from an Expression has no public classic-mode entry
  * point in Spark 4.x).
  */
object GraftSqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame from a LogicalPlan (classic `Dataset.ofRows` is
    * private[sql]) — used to execute plans produced by our resolution
    * rule in tests without rebuilding the session with extensions.
    */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Register a temp SQL function backed by a native expression builder,
    * so `spark.sql("... z_interleave(a, b, c) ...")` plans the codegen'd
    * expression directly.
    */
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit = {
    import org.apache.spark.sql.classic.ClassicConversions._
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "built-in")
  }
}
