package graft.ingest

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Generic typed payload parse (FIXTURES.md §A: a payload field set
  * exercising every supported type): Utf8, Boolean, Int64, Float64,
  * Date32, Timestamp µs, List<T> (incl. nested), Map<K,V>, explicit
  * null for any type, and the per-field error taxonomy — the full
  * reference matrix (`/root/reference/src/utils/mod.rs:45-153`).
  */
class TypedParseSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("s", StringType),
    StructField("b", BooleanType),
    StructField("i", LongType),
    StructField("f", DoubleType),
    StructField("d", DateType),
    StructField("ts", TimestampType),
    StructField("xs", ArrayType(LongType)),
    StructField("nested", ArrayType(ArrayType(LongType))),
    StructField("m", MapType(StringType, LongType))))

  private def msg(offset: Long, value: String): RawMessage =
    RawMessage("t", 0, offset, Some(s"k$offset"), value)

  private val full =
    """{"s":"hello","b":true,"i":42,"f":1.5,"d":"2024-02-29",
      |"ts":"2024-03-05T12:34:56.123456Z",
      |"xs":[1,2,3],"nested":[[1],[2,3]],"m":{"a":7,"b":8}}""".stripMargin.replace("\n", "")

  test("every supported type round-trips with exact values") {
    val (valid, dead) = TypedParse.parse(Seq(msg(0, full)).toDS(), schema)
    assert(dead.count() == 0)
    val r = valid.head()
    assert(r.getAs[String]("s") == "hello")
    assert(r.getAs[Boolean]("b"))
    assert(r.getAs[Long]("i") == 42L)
    assert(r.getAs[Double]("f") == 1.5)
    assert(r.getAs[java.sql.Date]("d").toString == "2024-02-29")
    // Timestamp keeps MICROSECOND precision (the reference's append path
    // divides by 1000 twice — a recorded bug we must not inherit).
    val micros = valid.select(unix_micros($"ts")).head().getLong(0)
    val expected = java.time.Instant.parse("2024-03-05T12:34:56.123456Z")
    assert(micros == expected.getEpochSecond * 1000000L + expected.getNano / 1000L)
    assert(r.getAs[scala.collection.Seq[Long]]("xs") == Seq(1L, 2L, 3L))
    assert(r.getAs[scala.collection.Seq[scala.collection.Seq[Long]]]("nested")
      .map(_.toSeq) == Seq(Seq(1L), Seq(2L, 3L)))
    assert(r.getAs[Map[String, Long]]("m") == Map("a" -> 7L, "b" -> 8L))
  }

  test("RFC3339 timestamps parse at any fractional-second width") {
    val cases = Seq(
      0L -> ("2024-03-05T12:34:56Z", 0L),
      1L -> ("2024-03-05T12:34:56.1Z", 100000L),
      2L -> ("2024-03-05T12:34:56.123Z", 123000L),
      3L -> ("2024-03-05T12:34:56.123456Z", 123456L),
      4L -> ("2024-03-05T13:34:56+01:00", 0L)) // offset form, same instant
    val base = java.time.Instant.parse("2024-03-05T12:34:56Z").getEpochSecond * 1000000L
    val msgs = cases.map { case (o, (ts, _)) =>
      msg(o, full.replace("2024-03-05T12:34:56.123456Z", ts))
    }.toDS()
    val (valid, dead) = TypedParse.parse(msgs, schema)
    assert(dead.count() == 0, dead.collect().map(_.error).mkString("; "))
    val got = valid.select($"offset", unix_micros($"ts")).as[(Long, Long)]
      .collect().toMap
    cases.foreach { case (o, (_, frac)) =>
      assert(got(o) == base + frac, s"offset $o")
    }
  }

  test("explicit JSON null is a legal value for any type (TypedValue::Null)") {
    val nulls =
      """{"s":null,"b":null,"i":null,"f":null,"d":null,"ts":null,
        |"xs":null,"nested":null,"m":null}""".stripMargin.replace("\n", "")
    val (valid, dead) = TypedParse.parse(Seq(msg(0, nulls)).toDS(), schema)
    assert(dead.count() == 0 && valid.count() == 1)
    val r = valid.head()
    schema.fieldNames.foreach(f => assert(r.isNullAt(r.fieldIndex(f)), f))
  }

  test("missing fields are dead-lettered with every missing name") {
    val (valid, dead) = TypedParse.parse(
      Seq(msg(0, """{"s":"x","i":1,"f":1.0,"d":"2024-01-01","ts":"2024-01-01T00:00:00Z","xs":[],"nested":[]}""")).toDS(),
      schema)
    assert(valid.count() == 0)
    val err = dead.head().error
    assert(err.startsWith("MissingField"))
    assert(err.contains("b") && err.contains("m"))
  }

  test("per-field type mismatches are dead-lettered with the field names") {
    val cases = Seq(
      0L -> full.replace("\"i\":42", "\"i\":\"notanumber\""),
      1L -> full.replace("\"d\":\"2024-02-29\"", "\"d\":\"2024-13-45\""),
      2L -> full.replace("\"ts\":\"2024-03-05T12:34:56.123456Z\"", "\"ts\":\"noon\""),
      3L -> full.replace("\"b\":true", "\"b\":\"yes\""))
    val (valid, dead) = TypedParse.parse(cases.map { case (o, v) => msg(o, v) }.toDS(), schema)
    assert(valid.count() == 0)
    val errs = dead.collect().map(d => d.offset -> d.error).toMap
    assert(errs(0L).startsWith("TypeMismatch") && errs(0L).contains("i"))
    assert(errs(1L).contains("d"), s"bad date: ${errs(1L)}")
    assert(errs(2L).contains("ts"))
    assert(errs(3L).contains("b"))
  }

  test("non-object payloads are ParseError; empty object is silently dropped") {
    val (valid, dead) = TypedParse.parse(Seq(
      msg(0, "not json"), msg(1, "[1,2]"), msg(2, "{}"),
      msg(3, full)).toDS(), schema)
    assert(valid.count() == 1)
    val errs = dead.collect().map(d => d.offset -> d.error).toMap
    assert(errs.keySet == Set(0L, 1L))
    assert(errs.values.forall(_.startsWith("ParseError")))
  }
}
