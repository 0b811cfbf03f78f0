package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Embedding-vector kernels shared by interpreted and generated paths.
  * Same rationale as [[GramUtil]]: the HOF formulations
  * (`transform` / `aggregate(zip_with(...))`) are interpreted per
  * ELEMENT; the ANN signature stage runs dim x nPlanes of them per row,
  * which dominated every similarity query.
  */
object VecUtil {
  /** q_j = floor(v_j * 100 + 0.5) — bit-identical to the Column form
    * `floor(v.cast("double") * 100 + 0.5d).cast("long")` (float->double
    * widening is exact; multiply/add/floor are the same IEEE ops).
    */
  def quantize(emb: ArrayData, scale: Int): ArrayData = {
    val n = emb.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      // Embeddings have no null components; a null (schema-permitted
      // only because parquet arrays default containsNull=true) maps to
      // 0 deterministically rather than null-poisoning the vector.
      out(i) =
        if (emb.isNullAt(i)) 0L
        else math.floor(emb.getFloat(i).toDouble * scale + 0.5d).toLong
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Integer dot product over the common prefix (embeddings share a
    * fixed dim; the min() guard just makes length mismatch deterministic
    * instead of null-poisoning like zip_with padding would). Plain Long
    * arithmetic: quantized components are bounded (|q| <= ~100 at
    * scale 100, plane components <= 1000), so |dot| <= ~10^8 at dim 64 —
    * nowhere near overflow.
    */
  def qdot(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    acc
  }
}

/** floor(v*scale + 0.5) per element: ARRAY<FLOAT> -> ARRAY<BIGINT>. */
case class QuantizeVec(child: Expression, scale: Int) extends UnaryExpression {
  override def prettyName: String = "quantize_vec"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override lazy val deterministic: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"quantize_vec expects ARRAY<FLOAT>, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    VecUtil.quantize(input.asInstanceOf[ArrayData], scale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VecUtil.quantize($c, $scale)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Integer dot product: (ARRAY<BIGINT>, ARRAY<BIGINT>) -> BIGINT. */
case class QDotVec(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "qdot_vec"
  override def dataType: DataType = LongType
  override lazy val deterministic: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"qdot_vec expects two ARRAY<BIGINT>, got ${l.simpleString}, ${r.simpleString}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecUtil.qdot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.VecUtil.qdot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VecOps {
  def quantize(emb: Column, scale: Int): Column =
    GraftSqlBridge.column(QuantizeVec(GraftSqlBridge.expression(emb), scale))

  def qdot(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      QDotVec(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
