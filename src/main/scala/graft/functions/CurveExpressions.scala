package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Native (whole-stage-codegen) Catalyst expressions for the clustering
  * keys — a UDF here would break the codegen span of the clustering
  * pipeline's hot projection, so these generate straight-line Java that
  * calls [[Keys]] (see builder-prompt preference order: native
  * `Expression` with `doGenCode` beats a Scala UDF).
  */
abstract class CurveKeyExpression extends Expression {
  def children: Seq[Expression]
  def bitsPer: Int

  /** Fully-qualified static method the generated code calls. */
  protected def staticFn: String
  /** Scala-side evaluator for interpreted mode. */
  protected def compute(dims: Array[Long]): Long

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override lazy val deterministic: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (children.forall(_.dataType == LongType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects LONG inputs, got " +
          children.map(_.dataType.simpleString).mkString(", "))
  }

  override def eval(input: InternalRow): Any = {
    val dims = new Array[Long](children.length)
    var i = 0
    while (i < children.length) {
      val v = children(i).eval(input)
      if (v == null) return null
      dims(i) = v.asInstanceOf[Long]
      i += 1
    }
    compute(dims)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val arr = ctx.freshName("dims")
    val childCode = evals.map(_.code.toString).mkString("\n")
    val nullCheck =
      if (nullable) evals.map(_.isNull.toString).mkString(" || ") else "false"
    val fills = evals.zipWithIndex
      .map { case (e, i) => s"$arr[$i] = ${e.value};" }
      .mkString("\n        ")
    ev.copy(code = code"""
      $childCode
      boolean ${ev.isNull} = $nullCheck;
      long ${ev.value} = 0L;
      if (!${ev.isNull}) {
        long[] $arr = new long[${children.length}];
        $fills
        ${ev.value} = $staticFn($arr, $bitsPer);
      }""")
  }
}

/** Z-order key: bitwise interleave of the low `bitsPer` bits of each
  * child (all LONG), MSB-first. Lexicographic order of the result is
  * Morton/Z-order over the inputs.
  */
case class ZInterleave(children: Seq[Expression], bitsPer: Int)
    extends CurveKeyExpression {
  require(children.nonEmpty && children.length * bitsPer <= 63,
    s"zinterleave: ${children.length} dims x $bitsPer bits must be in (0, 63]")
  override def prettyName: String = "z_interleave"
  override protected def staticFn: String = "graft.functions.Keys.zInterleave"
  override protected def compute(dims: Array[Long]): Long =
    Keys.zInterleave(dims, bitsPer)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

/** Hilbert-curve key over the children (all LONG, each in
  * [0, 2^bitsPer)): position on the Hilbert curve, which has strictly
  * better locality than Z-order for range queries on any single dim.
  */
case class HilbertIndex(children: Seq[Expression], bitsPer: Int)
    extends CurveKeyExpression {
  require(children.nonEmpty && children.length * bitsPer <= 63,
    s"hilbert_index: ${children.length} dims x $bitsPer bits must be in (0, 63]")
  override def prettyName: String = "hilbert_index"
  override protected def staticFn: String = "graft.functions.Keys.hilbertIndex"
  override protected def compute(dims: Array[Long]): Long =
    Keys.hilbertIndex(dims, bitsPer)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

/** Column-level entry points (Dataset API). */
object CurveKeys {
  private def expr(c: Column): Expression = GraftSqlBridge.expression(c)

  /** zkey(cols...) — interleave `bitsPer` bits of each LONG column. */
  def zkey(bitsPer: Int, cols: Column*): Column =
    GraftSqlBridge.column(ZInterleave(cols.map(expr), bitsPer))

  /** hilbertKey(cols...) — Hilbert position over LONG columns. */
  def hilbertKey(bitsPer: Int, cols: Column*): Column =
    GraftSqlBridge.column(HilbertIndex(cols.map(expr), bitsPer))

  /** SQL registration: `z_interleave(c1, c2, c3)` / `hilbert_index(...)`
    * with the default 20 bits/dim (3 dims fit in 60 bits).
    */
  def register(spark: org.apache.spark.sql.SparkSession, bitsPer: Int = 20): Unit = {
    GraftSqlBridge.registerFunction(spark, "z_interleave",
      (es: Seq[Expression]) => ZInterleave(es, bitsPer))
    GraftSqlBridge.registerFunction(spark, "hilbert_index",
      (es: Seq[Expression]) => HilbertIndex(es, bitsPer))
  }
}
