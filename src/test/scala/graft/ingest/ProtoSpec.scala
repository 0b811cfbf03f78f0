package graft.ingest

import graft.SparkSpec
import graft.functions.proto
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

/** P2 proto3 wire-format codec: golden bytes (hand-derived from the
  * proto3 encoding spec), wire-level decode laws (packed/expanded
  * equivalence, last-one-wins, unknown-field skip), the full error
  * taxonomy, and the DataFrame-level split contract.
  */
class ProtoSpec extends SparkSpec {

  private val tokenSchema = StructType(Seq(
    StructField("doc_id", StringType),
    StructField("tokens", ArrayType(IntegerType)),
    StructField("n_tok", IntegerType),
    StructField("source", StringType)))

  private def toInternal(schema: StructType, row: Row): InternalRow =
    CatalystTypeConverters.createToCatalystConverter(schema)(row)
      .asInstanceOf[InternalRow]

  private def fromInternal(schema: StructType, row: InternalRow): Row =
    CatalystTypeConverters.createToScalaConverter(schema)(row).asInstanceOf[Row]

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  private def decodeRow(b: Array[Byte], schema: StructType = tokenSchema): Row = {
    val d = ProtoCodec.decode(b, schema)
    assert(d.error == null, s"unexpected error: ${d.error}")
    fromInternal(schema, d.value)
  }

  private def decodeErr(b: Array[Byte], schema: StructType = tokenSchema): String = {
    val d = ProtoCodec.decode(b, schema)
    assert(d.error != null, "expected an error")
    d.error
  }

  // Hand-derived: doc_id="ab" -> 0A 02 61 62; tokens=[1,2,300] packed
  // -> 12 04 01 02 AC 02; n_tok=3 -> 18 03; source="web" -> 22 03 77 65 62.
  private val golden = bytes(
    0x0a, 0x02, 0x61, 0x62,
    0x12, 0x04, 0x01, 0x02, 0xac, 0x02,
    0x18, 0x03,
    0x22, 0x03, 0x77, 0x65, 0x62)
  private val goldenRow = Row("ab", Seq(1, 2, 300), 3, "web")

  test("golden encode: token payload matches hand-derived proto3 bytes") {
    val enc = ProtoCodec.encode(toInternal(tokenSchema, goldenRow), tokenSchema)
    assert(enc.toSeq == golden.toSeq)
  }

  test("golden decode: hand-derived bytes round back to the row") {
    assert(decodeRow(golden) == goldenRow)
  }

  test("expanded repeated form decodes identically to packed") {
    // tokens as three separate VARINT occurrences: tag (2<<3)|0 = 0x10.
    val expanded = bytes(
      0x0a, 0x02, 0x61, 0x62,
      0x10, 0x01, 0x10, 0x02, 0x10, 0xac, 0x02,
      0x18, 0x03,
      0x22, 0x03, 0x77, 0x65, 0x62)
    assert(decodeRow(expanded) == goldenRow)
  }

  test("repeated occurrences of a list field concatenate; scalar last-one-wins") {
    // two packed chunks [1] and [2,300]; doc_id written twice ("xx" then "ab")
    val b = bytes(
      0x0a, 0x02, 0x78, 0x78,
      0x12, 0x01, 0x01,
      0x18, 0x03,
      0x12, 0x03, 0x02, 0xac, 0x02,
      0x0a, 0x02, 0x61, 0x62,
      0x22, 0x03, 0x77, 0x65, 0x62)
    assert(decodeRow(b) == goldenRow)
  }

  test("unknown field numbers are skipped (proto3 forward compat)") {
    // prepend field 9 varint, field 10 LEN, field 11 fixed64, field 12 fixed32
    val b = bytes(0x48, 0x7f, 0x52, 0x02, 0x01, 0x02,
      0x59, 1, 2, 3, 4, 5, 6, 7, 8, 0x65, 1, 2, 3, 4) ++ golden
    assert(decodeRow(b) == goldenRow)
  }

  test("zero-byte payload is dropped (both error and value null)") {
    val d = ProtoCodec.decode(Array.emptyByteArray, tokenSchema)
    assert(d.error == null && d.value == null)
  }

  test("missing fields list in schema order (repeated fields have no presence)") {
    // Only doc_id present: the scalar fields are missing; `tokens`
    // (repeated) is NOT — proto3 repeated fields have no presence, so
    // absent decodes as the empty list (ADVICE r5 round-trip fix).
    assert(decodeErr(bytes(0x0a, 0x02, 0x61, 0x62))
      == "MissingField: n_tok, source")
  }

  test("absent repeated/map fields decode as empty collections (round-trip)") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("xs", ArrayType(StringType)),
      StructField("m", MapType(StringType, LongType))))
    // Only id=7 present (tag 1 VARINT).
    val d = ProtoCodec.decode(bytes(0x08, 0x07), schema)
    assert(d.error == null)
    assert(d.value.getArray(1).numElements() == 0)
    assert(d.value.getMap(2).numElements() == 0)
  }

  test("duplicate map keys: last entry wins (proto3 map semantics)") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("m", MapType(StringType, LongType))))
    // Two entries for key "a": 1 then 9 -> map must hold a->9 only.
    def entry(v: Int) = bytes(0x0a, 0x05, 0x0a, 0x01, 0x61, 0x10, v)
    val d = ProtoCodec.decode(entry(1) ++ entry(9), schema)
    assert(d.error == null)
    val m = d.value.getMap(0)
    assert(m.numElements() == 1)
    assert(m.valueArray().getLong(0) == 9L)
  }

  test("field numbers above 2^29-1 are Malformed, never wrapped onto a column") {
    // tag = (2^31 + 1) << 3 | VARINT: would truncate to field 1 via
    // .toInt; must be rejected as ParseError instead.
    val w = new java.io.ByteArrayOutputStream()
    var tag = ((1L << 31) + 1L) << 3
    while ((tag & ~0x7fL) != 0) { w.write((((tag & 0x7f) | 0x80).toInt)); tag >>>= 7 }
    w.write(tag.toInt)
    w.write(0x07) // the varint payload
    val d = ProtoCodec.decode(w.toByteArray, tokenSchema)
    assert(d.error != null && d.error.startsWith("ParseError"), d.error)
  }

  test("wrong wire type is a TypeMismatch, not a parse abort") {
    // n_tok (field 3) as LEN instead of varint; everything else valid
    val b = bytes(
      0x0a, 0x02, 0x61, 0x62,
      0x12, 0x04, 0x01, 0x02, 0xac, 0x02,
      0x1a, 0x01, 0x33, // tag (3<<3)|2, len 1, "3"
      0x22, 0x03, 0x77, 0x65, 0x62)
    assert(decodeErr(b) == "TypeMismatch: n_tok")
  }

  test("int32 varint out of 32-bit range is a TypeMismatch") {
    // n_tok = 2^32 (varint 80 80 80 80 10)
    val b = bytes(
      0x0a, 0x02, 0x61, 0x62,
      0x12, 0x04, 0x01, 0x02, 0xac, 0x02,
      0x18, 0x80, 0x80, 0x80, 0x80, 0x10,
      0x22, 0x03, 0x77, 0x65, 0x62)
    assert(decodeErr(b) == "TypeMismatch: n_tok")
  }

  test("structural corruption is a ParseError") {
    // truncated varint at the very end
    assert(decodeErr(bytes(0x18, 0x80))
      .startsWith("ParseError: truncated varint"))
    // LEN length pointing past the end
    assert(decodeErr(bytes(0x0a, 0x7f, 0x61))
      .startsWith("ParseError: length past end"))
    // deprecated group wire type (3)
    assert(decodeErr(bytes(0x0b)).startsWith("ParseError: unsupported wire type"))
    // varint longer than 10 bytes
    assert(decodeErr(bytes(0x18) ++ Array.fill(11)(0x80.toByte))
      .startsWith("ParseError: varint longer"))
  }

  test("negative int32 sign-extends to 10 wire bytes and round-trips") {
    val row = Row("n", Seq(-1, Int.MinValue), -7, "s")
    val enc = ProtoCodec.encode(toInternal(tokenSchema, row), tokenSchema)
    assert(decodeRow(enc) == row)
  }

  test("full type matrix round-trips: date, timestamp, double, map, nested struct") {
    val inner = StructType(Seq(
      StructField("a", LongType), StructField("b", StringType)))
    val schema = StructType(Seq(
      StructField("d", DateType),
      StructField("ts", TimestampType),
      StructField("x", DoubleType),
      StructField("m", MapType(StringType, LongType)),
      StructField("st", inner),
      StructField("bs", BinaryType),
      StructField("fl", FloatType),
      StructField("bl", BooleanType),
      StructField("xs", ArrayType(DoubleType))))
    val row = Row(
      java.sql.Date.valueOf("2024-01-31"),
      java.sql.Timestamp.valueOf("2024-03-05 12:34:56.123456"),
      -math.Pi,
      Map("k1" -> 5L, "k2" -> -9L),
      Row(42L, "nested"),
      Array[Byte](0, 1, -2),
      1.5f,
      true,
      Seq(0.0, -1.25))
    val enc = ProtoCodec.encode(toInternal(schema, row), schema)
    val back = decodeRow(enc, schema)
    assert(back.getDate(0) == row.getDate(0))
    assert(back.getTimestamp(1) == row.getTimestamp(1))
    assert(back.getDouble(2) == row.getDouble(2))
    assert(back.getMap[String, Long](3) == Map("k1" -> 5L, "k2" -> -9L))
    assert(back.getStruct(4) == Row(42L, "nested"))
    assert(back.getAs[Array[Byte]](5).toSeq == Seq[Byte](0, 1, -2))
    assert(back.getFloat(6) == 1.5f)
    assert(back.getBoolean(7))
    assert(back.getSeq[Double](8) == Seq(0.0, -1.25))
  }

  test("nested submessage: absent scalars take proto3 defaults, absent message is null") {
    val inner = StructType(Seq(
      StructField("a", LongType), StructField("b", StringType),
      StructField("deep", StructType(Seq(StructField("z", LongType))))))
    val schema = StructType(Seq(StructField("st", inner)))
    // st = empty submessage: tag (1<<3)|2, len 0
    val back = decodeRow(bytes(0x0a, 0x00), schema)
    assert(back.getStruct(0) == Row(0L, "", null))
  }

  test("encoded null field decodes as MissingField (the JSON-null quarantine analog)") {
    val enc = ProtoCodec.encode(
      toInternal(tokenSchema, Row("ab", Seq(1), null, "web")), tokenSchema)
    assert(decodeErr(enc) == "MissingField: n_tok")
  }

  test("DataFrame round trip through the codegen'd expressions") {
    import spark.implicits._
    val df = spark.range(0, 1000, 1, 4)
      .select(
        concat(lit("doc-"), col("id")).as("doc_id"),
        sequence(lit(0).cast("int"), (col("id") % 5).cast("int")).as("tokens"),
        (col("id") % 5 + 1).cast("int").as("n_tok"),
        lit("gen").as("source"))
    val enc = df.select(proto.encode(struct(
      col("doc_id"), col("tokens"), col("n_tok"), col("source"))).as("payload"))
    val dec = enc.select(proto.decode(col("payload"), tokenSchema).as("d"))
      .select(col("d.error"), col("d.value.*"))
    assert(dec.filter(col("error").isNotNull).count() == 0)
    assert(dec.agg(sum(col("n_tok"))).head.getLong(0)
      == df.agg(sum(col("n_tok"))).head.getLong(0))
    assert(dec.filter(col("doc_id") === "doc-7").head
      .getSeq[Int](dec.columns.indexOf("tokens")).toList == List(0, 1, 2))
  }

  test("ProtoParse split: valid / dead-lettered / dropped, payload restorable from base64") {
    import spark.implicits._
    val encodeCol = proto.encode(struct(
      col("doc_id"), col("tokens"), col("n_tok"), col("source")))
    // id%10==3 -> null n_tok (absent field -> MissingField)
    // id%10==7 -> truncated payload (ParseError)
    // id%10==9 -> empty payload (dropped)
    val base = spark.range(0, 100, 1, 4)
      .select(
        lit("t").as("topic"), lit(0).as("partition"), col("id").as("offset"),
        lit(null.asInstanceOf[String]).as("key"),
        concat(lit("doc-"), col("id")).as("doc_id"),
        array(lit(1), lit(2)).cast("array<int>").as("tokens"),
        when(col("id") % 10 === 3, lit(null.asInstanceOf[Integer]))
          .otherwise(lit(2)).cast("int").as("n_tok"),
        lit("gen").as("source"))
      .withColumn("payload", encodeCol)
      .select(col("topic"), col("partition"), col("offset"), col("key"),
        when(col("offset") % 10 === 9, lit(Array.emptyByteArray))
          .when(col("offset") % 10 === 7,
            expr("substring(payload, 1, length(payload) - 2)"))
          .otherwise(col("payload")).as("value"))
      .as[RawProtoMessage]

    val (valid, dead) = Ingest.parseProto(base)
    assert(valid.count() == 70)
    val deadRows = dead.collect()
    assert(deadRows.length == 20)
    assert(deadRows.count(_.error.startsWith("MissingField: n_tok")) == 10)
    assert(deadRows.count(_.error.startsWith("ParseError")) == 10)
    // the base64 payload embeds the exact original bytes
    val restored = dead.toDF()
      .filter(col("offset") === 7)
      .select(unbase64(col("value")).as("raw"))
      .head.getAs[Array[Byte]]("raw")
    val original = base.toDF().filter(col("offset") === 7)
      .head.getAs[Array[Byte]]("value")
    assert(restored.toSeq == original.toSeq)
  }

  test("p2_proto_parse driver query: taxonomy split matches the oracle arithmetic") {
    val out = graft.Queries.p2ProtoParse(spark, "/root/testdata/sf0.001").cache()
    val total = spark.read.parquet("/root/testdata/sf0.001/events.parquet").count()
    assert(out.count() == total)
    assert(out.filter(col("err").isNull).count()
      == out.filter(col("event_id") % 10 =!= 3 && col("event_id") % 10 =!= 5
        && col("event_id") % 10 =!= 7 && col("event_id") % 10 =!= 9).count())
    // spot-check one row per taxonomy arm
    def errOf(mod: Int): String =
      out.filter(col("event_id") % 10 === mod).select(col("err")).head.getString(0)
    assert(errOf(3) == "MissingField: d")
    assert(errOf(5) == "MissingField: s")
    assert(errOf(7) == "TypeMismatch: ts")
    assert(errOf(9) == "ParseError: length past end of payload")
    val ok = out.filter(col("event_id") === 12).head
    assert(ok.getString(ok.fieldIndex("d_str")) == "2024-01-13")
    assert(ok.getLong(ok.fieldIndex("ts_us")) == 1709642040000000L + 12L * 1000000 + 12)
    assert(ok.getLong(ok.fieldIndex("xs_sum")) == (12 % 7) + (12 % 11) + (12 % 13))
    assert(ok.getLong(ok.fieldIndex("m_a")) == 12)
    out.unpersist()
  }

  test("grpc message format parses from config (reference delta.message_format alias)") {
    val cfg = graft.config.GraftConfig.load(Map(
      "table.path" -> "/tmp/t",
      "source.topics" -> "a",
      "source.group_id" -> "g",
      "source.message_format" -> "grpc")).toOption.get
    assert(cfg.messageFormat == graft.config.MessageFormat.Grpc)
    val bad = graft.config.GraftConfig.load(Map(
      "table.path" -> "/tmp/t",
      "source.topics" -> "a",
      "source.group_id" -> "g",
      "source.message_format" -> "avro"))
    assert(bad.isLeft)
  }
}
