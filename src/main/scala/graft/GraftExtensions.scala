package graft

import graft.functions.{HilbertIndex, ZInterleave}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions hook: registers the engine's native
  * expressions so any session created with
  * `--conf spark.sql.extensions=graft.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`) can use
  * `z_interleave(a, b, c)` / `hilbert_index(a, b, c)` in SQL text —
  * the public, supported way to ship custom Catalyst expressions
  * (vs session-local temp-function registration in
  * [[graft.functions.CurveKeys.register]]).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectResolutionRule(session =>
      graft.plans.TokenTableResolution(
        session.asInstanceOf[org.apache.spark.sql.SparkSession]))
    ext.injectFunction((
      new FunctionIdentifier("z_interleave"),
      new ExpressionInfo(classOf[ZInterleave].getName, "z_interleave"),
      (children: Seq[Expression]) => ZInterleave(children, bitsPer = 20)))
    ext.injectFunction((
      new FunctionIdentifier("hilbert_index"),
      new ExpressionInfo(classOf[HilbertIndex].getName, "hilbert_index"),
      (children: Seq[Expression]) => HilbertIndex(children, bitsPer = 20)))
  }
}
