package graft.ingest

import graft.functions.proto
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** A raw gRPC-mode message: same Kafka metadata as [[RawMessage]], but
  * the payload is wire bytes, not a JSON string (reference
  * `MessageFormat::Grpc` dispatch, `/root/reference/src/kafka/mod.rs:272-278`).
  */
case class RawProtoMessage(topic: String, partition: Int, offset: Long,
    key: Option[String], value: Array[Byte])

/** P2: proto3 payload parse against an arbitrary schema — the gRPC-mode
  * sibling of [[TypedParse]], with the identical split contract:
  * (valid rows: message metadata + one typed column per schema field,
  * dead letters). One Catalyst plan; the decode is a single codegen'd
  * [[graft.functions.ProtoDecode]] projection, so the taxonomy
  * classification costs one pass with zero shuffles — at 100 TB this
  * parallelizes embarrassingly, exactly like the JSON path.
  *
  * Dead letters preserve the payload as base64 (the DeadLetter contract
  * is a STRING payload column shared with the JSON path; base64 is the
  * lossless embedding — `unbase64(value)` restores the exact bytes for
  * replay).
  */
object ProtoParse {

  def parse(msgs: Dataset[RawProtoMessage], schema: StructType)
      : (DataFrame, Dataset[DeadLetter]) = {
    val spark = msgs.sparkSession
    import spark.implicits._
    val decoded = msgs.withColumn("__d", proto.decode($"value", schema))
    val fieldCols = schema.fields.toSeq.map(f =>
      $"__d".getField("value").getField(f.name).as(f.name))
    val valid = decoded
      .filter($"__d".getField("error").isNull && $"__d".getField("value").isNotNull)
      .select(Seq($"topic", $"partition", $"offset", $"key") ++ fieldCols: _*)
    val dead = decoded
      .filter($"__d".getField("error").isNotNull)
      .select($"topic", $"partition", $"offset", $"key",
        base64($"value").as("value"), $"__d".getField("error").as("error"))
      .as[DeadLetter]
    (valid, dead)
  }
}
