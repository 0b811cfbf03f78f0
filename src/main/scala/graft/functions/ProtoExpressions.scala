package graft.functions

import graft.ingest.ProtoBound
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Native proto3 wire-format expressions (P2). Both are thin codegen'd
  * shims over [[graft.ingest.ProtoCodec]] via one schema-bound
  * reference object — one static-shaped virtual call per row, no UDF,
  * whole-stage codegen unbroken (the same shape Spark's own from_csv /
  * from_protobuf connectors use, minus their descriptor-file plumbing,
  * which the reference's schema-positional contract makes unnecessary).
  */
case class ProtoEncode(child: Expression) extends UnaryExpression {
  override def prettyName: String = "proto_encode"
  override def dataType: DataType = BinaryType
  override lazy val deterministic: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StructType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"proto_encode expects STRUCT, got ${other.simpleString}")
  }

  @transient private lazy val bound =
    new ProtoBound(child.dataType.asInstanceOf[StructType])

  override protected def nullSafeEval(input: Any): Any =
    bound.encode(input.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("protoBound", bound, classOf[ProtoBound].getName)
    defineCodeGen(ctx, ev, c => s"$ref.encode($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Decode a proto3 payload against `schema` (field numbers = 1-based
  * schema positions). Returns `STRUCT<error: STRING, value:
  * STRUCT<schema>>`: error non-null -> dead letter; both null -> the
  * zero-byte all-defaults payload (the `{}` analog, silently dropped);
  * else `value` holds the typed row. Never throws on data — corruption
  * is a VALUE (the taxonomy string), exactly like the PERMISSIVE
  * from_json path it sits beside.
  */
case class ProtoDecode(child: Expression, schema: StructType)
    extends UnaryExpression {
  override def prettyName: String = "proto_decode"
  override def dataType: DataType = StructType(Seq(
    StructField("error", StringType),
    StructField("value", schema)))
  override lazy val deterministic: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"proto_decode expects BINARY, got ${other.simpleString}")
  }

  @transient private lazy val bound = new ProtoBound(schema)

  override protected def nullSafeEval(input: Any): Any =
    bound.decode(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("protoBound", bound, classOf[ProtoBound].getName)
    defineCodeGen(ctx, ev, c => s"$ref.decode($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object proto {
  /** Encode a struct column as proto3 wire bytes. */
  def encode(c: Column): Column =
    GraftSqlBridge.column(ProtoEncode(GraftSqlBridge.expression(c)))

  /** Decode proto3 wire bytes against `schema`. */
  def decode(c: Column, schema: StructType): Column =
    GraftSqlBridge.column(ProtoDecode(GraftSqlBridge.expression(c), schema))
}
