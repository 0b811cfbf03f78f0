package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Generic schema-driven JSON payload parse — the reference's full
  * `json_to_typed` type matrix (`/root/reference/src/utils/mod.rs:45-118`)
  * and `parse_json_object` per-field error taxonomy
  * (`src/utils/mod.rs:122-153`), for ARBITRARY schemas: Utf8, Boolean,
  * Int64, Float64, Date32 (`yyyy-MM-dd`), Timestamp µs (RFC3339),
  * List<T> and Map<K,V> (both recursive via the StructType), plus
  * explicit JSON null for any type.
  *
  * One Catalyst plan, no UDFs: `from_json` (PERMISSIVE) does the typed
  * cast; `json_object_keys` + per-field `get_json_object` reconstruct
  * the reference's taxonomy:
  *  - non-object / unparseable payload -> ParseError (dead letter),
  *  - empty object `{}`                -> row silently dropped,
  *  - key absent                       -> MissingField: <names>,
  *  - key present, non-null raw value, null typed value
  *                                     -> TypeMismatch: <names>,
  *  - key present with JSON null       -> accepted, field is NULL
  *    (the reference's `TypedValue::Null` arm — unlike the token-table
  *    ingest path, which quarantines nulls because ITS schema declares
  *    every field non-nullable; see [[Ingest.parse]]).
  *
  * Two reference bugs intentionally NOT replicated (recorded in
  * SURVEY.md §1.2): Date32 panics at flush there (`mod.rs:201-204`) and
  * timestamps are divided by 1000 twice (`mod.rs:252`); Spark's native
  * DateType/TimestampType (µs) make both disappear.
  */
object TypedParse {

  /** No explicit timestampFormat: Spark's default JSON timestamp path
    * is the lenient ISO-8601 parser, which accepts RFC3339 with ANY
    * fractional-second width (.1, .123, .123456) and Z / numeric
    * offsets. A pattern like "[.SSSSSS]" would be EXACT-width — a
    * millisecond timestamp (the most common RFC3339 form) would be
    * dead-lettered as TypeMismatch.
    */
  def defaultOptions: Map[String, String] = Map(
    "dateFormat" -> "yyyy-MM-dd")

  /** Parse `value` (JSON string) of each message against `schema`.
    * Returns (valid rows: message metadata + one typed column per
    * schema field, dead letters).
    */
  def parse(msgs: Dataset[RawMessage], schema: StructType,
      options: Map[String, String] = defaultOptions): (DataFrame, Dataset[DeadLetter]) = {
    val spark = msgs.sparkSession
    import spark.implicits._
    val keyed = msgs
      .withColumn("__keys", json_object_keys($"value"))
      .withColumn("__parsed", from_json($"value", schema, options))
    val nonObject = $"__keys".isNull
    val emptyObject = $"__keys".isNotNull && size($"__keys") === 0

    val missing = schema.fields.toSeq.map(f =>
      when(!array_contains($"__keys", f.name), lit(f.name)))
    val missingList = filter(array(missing: _*), c => c.isNotNull)
    // Mismatch = the key is there, its raw JSON value is not null, but
    // the typed cast produced null (wrong type / unparseable date...).
    val mismatched = schema.fields.toSeq.map(f =>
      when(array_contains($"__keys", f.name) &&
        get_json_object($"value", s"$$.${f.name}").isNotNull &&
        $"__parsed".getField(f.name).isNull, lit(f.name)))
    val mismatchList = filter(array(mismatched: _*), c => c.isNotNull)

    val classified = keyed.withColumn("__error",
      when(nonObject, lit("ParseError: payload is not a JSON object"))
        .when(emptyObject, lit(null.asInstanceOf[String])) // dropped, not an error
        .when(size(missingList) > 0,
          concat(lit("MissingField: "), array_join(missingList, ", ")))
        .when($"__parsed".isNull, lit("TypeMismatch: payload does not match schema"))
        .when(size(mismatchList) > 0,
          concat(lit("TypeMismatch: "), array_join(mismatchList, ", "))))

    val fieldCols = schema.fields.toSeq.map(f =>
      $"__parsed".getField(f.name).as(f.name))
    val valid = classified
      .filter($"__error".isNull && !emptyObject)
      .select(Seq($"topic", $"partition", $"offset", $"key") ++ fieldCols: _*)
    val dead = classified
      .filter($"__error".isNotNull)
      .select($"topic", $"partition", $"offset", $"key", $"value", $"__error".as("error"))
      .as[DeadLetter]
    (valid, dead)
  }
}
