package graft.ingest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** P2: proto3 wire-format codec — the reference's `MessageFormat::Grpc`
  * parse arm, which is declared in its config
  * (`/root/reference/src/config/mod.rs:44-49`), dispatched in its
  * consumer loop (`src/kafka/mod.rs:272-278`), and left as a `todo!()`
  * stub (`src/utils/mod.rs:158-164`). We give it real semantics: the
  * payload is a proto3-wire-format message whose field numbers are the
  * 1-based positions of the target schema's fields, decoded with the
  * SAME error taxonomy as the JSON path (`parse_json_object`,
  * `src/utils/mod.rs:122-153`):
  *
  *  - structurally malformed wire data (truncated varint, bad wire
  *    type, length past end)            -> `ParseError: ...`
  *  - zero-byte payload (the proto3 encoding of an all-defaults
  *    message — the `{}` analog)        -> silently dropped
  *  - schema field number never present -> `MissingField: <names>`
  *    (proto3 cannot distinguish "absent" from "explicitly default",
  *    so our encoder always writes present non-null fields, even
  *    defaults — the standard explicit-presence convention). Repeated
  *    and map fields are exempt: proto3 gives them NO presence (zero
  *    occurrences and an empty collection are the same bytes), so an
  *    absent list/map decodes as the empty collection — the encoder's
  *    own empty collections round-trip instead of dead-lettering
  *  - field present with the wrong wire type for its schema type, or a
  *    varint out of the declared 32-bit range, or corrupt packed/
  *    map/submessage payload            -> `TypeMismatch: <names>`
  *
  * Type matrix (mirrors the JSON path's `json_to_typed` matrix,
  * `src/utils/mod.rs:45-118`): Utf8/Binary = LEN; Boolean/Int64/Int32 =
  * VARINT (int32 sign-extended to 64 bits on the wire, per the proto3
  * spec); Float64 = I64, Float32 = I32; Date32 = VARINT days since
  * epoch; Timestamp-µs = VARINT micros since epoch; List<T> = packed
  * LEN for fixed/varint elements (decode also accepts the expanded
  * repeated form, as the spec requires) and repeated LEN records for
  * string/binary/struct elements; Map<K,V> = repeated LEN entry
  * messages `{1: key, 2: value}`; nested Struct = LEN submessage.
  *
  * proto3 semantics honored on decode: unknown field numbers are
  * skipped, not errors; the LAST occurrence of a scalar field wins;
  * repeated occurrences of a list field concatenate; inside nested
  * submessages absent scalars take proto3 defaults (0 / "" / false),
  * absent message fields are null — the strict missing/mismatch
  * taxonomy applies to the TOP-level schema only, exactly like the
  * JSON path (whose `from_json` also nulls nested holes).
  */
object ProtoCodec {

  final val VARINT = 0
  final val I64 = 1
  final val LEN = 2
  final val I32 = 5

  /** proto3 caps field numbers at 2^29 - 1; larger (crafted) tags are
    * rejected as Malformed rather than truncated to Int, where a
    * 2^31+k number would wrap onto schema column k (ADVICE r5).
    */
  final val MaxFieldNumber = 536870911L

  /** Structural wire corruption — becomes `ParseError` at top level,
    * `TypeMismatch` when confined to one field's LEN payload.
    */
  private final class Malformed(val msg: String)
      extends Exception(msg, null, false, false)

  // ------------------------------------------------------------------
  // Encode
  // ------------------------------------------------------------------

  private final class Writer {
    private var buf = new Array[Byte](64)
    private var len = 0
    private def ensure(n: Int): Unit =
      if (len + n > buf.length)
        buf = java.util.Arrays.copyOf(buf, math.max(buf.length * 2, len + n))
    def size: Int = len
    def writeVarint(v: Long): Unit = {
      ensure(10)
      var x = v
      while ((x & ~0x7fL) != 0) {
        buf(len) = ((x & 0x7f) | 0x80).toByte; len += 1; x >>>= 7
      }
      buf(len) = (x & 0x7f).toByte; len += 1
    }
    def writeTag(field: Int, wire: Int): Unit =
      writeVarint((field.toLong << 3) | wire)
    def writeFixed64(v: Long): Unit = {
      ensure(8)
      var i = 0
      while (i < 8) { buf(len) = ((v >>> (8 * i)) & 0xff).toByte; len += 1; i += 1 }
    }
    def writeFixed32(v: Int): Unit = {
      ensure(4)
      var i = 0
      while (i < 4) { buf(len) = ((v >>> (8 * i)) & 0xff).toByte; len += 1; i += 1 }
    }
    def writeBytes(b: Array[Byte]): Unit = {
      ensure(b.length)
      System.arraycopy(b, 0, buf, len, b.length); len += b.length
    }
    def writeLenDelimited(b: Array[Byte]): Unit = {
      writeVarint(b.length.toLong); writeBytes(b)
    }
    def result(): Array[Byte] = java.util.Arrays.copyOf(buf, len)
  }

  /** True when the type rides the VARINT wire type as a scalar. */
  private def isVarintType(dt: DataType): Boolean = dt match {
    case BooleanType | LongType | IntegerType | DateType | TimestampType => true
    case _ => false
  }

  private def varintOf(dt: DataType, v: Any): Long = dt match {
    case BooleanType => if (v.asInstanceOf[Boolean]) 1L else 0L
    case LongType | TimestampType => v.asInstanceOf[Long]
    // int32/date32 sign-extend to 64 bits on the wire (proto3 spec)
    case IntegerType | DateType => v.asInstanceOf[Int].toLong
    case other => throw new IllegalArgumentException(s"not a varint type: $other")
  }

  /** Encode `row` against `schema` (field numbers = 1-based positions).
    * Null fields are absent — the only way proto3 can express null —
    * so a null in a required-field pipeline round-trips to
    * `MissingField`, mirroring how the JSON ingest path quarantines
    * explicit nulls. Null ARRAY ELEMENTS are skipped (unrepresentable),
    * and an empty string/struct-element array is likewise absent
    * (zero repeated occurrences and "no field" are the same bytes).
    */
  def encode(row: InternalRow, schema: StructType): Array[Byte] = {
    val w = new Writer
    var i = 0
    while (i < schema.length) {
      if (!row.isNullAt(i)) {
        val dt = schema(i).dataType
        encodeValue(w, i + 1, dt, row.get(i, dt))
      }
      i += 1
    }
    w.result()
  }

  private def encodeValue(w: Writer, field: Int, dt: DataType, v: Any): Unit = dt match {
    case StringType =>
      w.writeTag(field, LEN); w.writeLenDelimited(v.asInstanceOf[UTF8String].getBytes)
    case BinaryType =>
      w.writeTag(field, LEN); w.writeLenDelimited(v.asInstanceOf[Array[Byte]])
    case dt2 if isVarintType(dt2) =>
      w.writeTag(field, VARINT); w.writeVarint(varintOf(dt2, v))
    case DoubleType =>
      w.writeTag(field, I64)
      w.writeFixed64(java.lang.Double.doubleToLongBits(v.asInstanceOf[Double]))
    case FloatType =>
      w.writeTag(field, I32)
      w.writeFixed32(java.lang.Float.floatToIntBits(v.asInstanceOf[Float]))
    case ArrayType(et, _) =>
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      et match {
        case StringType | BinaryType | _: StructType =>
          var i = 0
          while (i < n) {
            if (!arr.isNullAt(i)) encodeValue(w, field, et, arr.get(i, et))
            i += 1
          }
        case DoubleType =>
          val inner = new Writer
          var i = 0
          while (i < n) {
            if (!arr.isNullAt(i))
              inner.writeFixed64(java.lang.Double.doubleToLongBits(arr.getDouble(i)))
            i += 1
          }
          w.writeTag(field, LEN); w.writeLenDelimited(inner.result())
        case FloatType =>
          val inner = new Writer
          var i = 0
          while (i < n) {
            if (!arr.isNullAt(i))
              inner.writeFixed32(java.lang.Float.floatToIntBits(arr.getFloat(i)))
            i += 1
          }
          w.writeTag(field, LEN); w.writeLenDelimited(inner.result())
        case vt if isVarintType(vt) =>
          val inner = new Writer
          var i = 0
          while (i < n) {
            if (!arr.isNullAt(i)) inner.writeVarint(varintOf(vt, arr.get(i, vt)))
            i += 1
          }
          w.writeTag(field, LEN); w.writeLenDelimited(inner.result())
        case other =>
          throw new IllegalArgumentException(s"proto encode: unsupported element type $other")
      }
    case MapType(kt, vt, _) =>
      val m = v.asInstanceOf[org.apache.spark.sql.catalyst.util.MapData]
      val keys = m.keyArray(); val vals = m.valueArray()
      var i = 0
      while (i < m.numElements()) {
        val entry = new Writer
        encodeValue(entry, 1, kt, keys.get(i, kt))
        if (!vals.isNullAt(i)) encodeValue(entry, 2, vt, vals.get(i, vt))
        w.writeTag(field, LEN); w.writeLenDelimited(entry.result())
        i += 1
      }
    case st: StructType =>
      w.writeTag(field, LEN); w.writeLenDelimited(encode(v.asInstanceOf[InternalRow], st))
    case other =>
      throw new IllegalArgumentException(s"proto encode: unsupported type $other")
  }

  // ------------------------------------------------------------------
  // Decode
  // ------------------------------------------------------------------

  private final class Reader(val b: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end
    def readVarint(): Long = {
      var shift = 0
      var v = 0L
      while (shift < 64) {
        if (pos >= end) throw new Malformed("truncated varint")
        val byte = b(pos); pos += 1
        v |= (byte & 0x7fL) << shift
        if ((byte & 0x80) == 0) return v
        shift += 7
      }
      throw new Malformed("varint longer than 10 bytes")
    }
    def readFixed64(): Long = {
      if (pos + 8 > end) throw new Malformed("truncated fixed64")
      var v = 0L
      var i = 0
      while (i < 8) { v |= (b(pos + i) & 0xffL) << (8 * i); i += 1 }
      pos += 8; v
    }
    def readFixed32(): Int = {
      if (pos + 4 > end) throw new Malformed("truncated fixed32")
      var v = 0
      var i = 0
      while (i < 4) { v |= (b(pos + i) & 0xff) << (8 * i); i += 1 }
      pos += 4; v
    }
    /** Consume a LEN payload, returning a sub-reader over it. */
    def readSlice(): Reader = {
      val n = readVarint()
      if (n < 0 || n > end - pos) throw new Malformed("length past end of payload")
      val r = new Reader(b, pos, pos + n.toInt)
      pos += n.toInt
      r
    }
    def skip(wire: Int): Unit = wire match {
      case VARINT => readVarint(); ()
      case I64 => if (pos + 8 > end) throw new Malformed("truncated fixed64") else pos += 8
      case I32 => if (pos + 4 > end) throw new Malformed("truncated fixed32") else pos += 4
      case LEN => readSlice(); ()
      case w => throw new Malformed(s"unsupported wire type $w")
    }
  }

  /** Decode outcome: `error != null` -> dead letter; both null -> the
    * zero-byte all-defaults payload (dropped, the `{}` analog);
    * otherwise `value` is a row of `schema`.
    */
  final case class Decoded(error: String, value: InternalRow)

  private def checkedInt(v: Long, idx: Int, mismatch: Array[Boolean]): Any =
    if (v < Int.MinValue || v > Int.MaxValue) { mismatch(idx) = true; null }
    else Int.box(v.toInt)

  private def scalarFromVarint(dt: DataType, v: Long, idx: Int,
      mismatch: Array[Boolean]): Any = dt match {
    case BooleanType => Boolean.box(v != 0L)
    case LongType | TimestampType => Long.box(v)
    case IntegerType | DateType => checkedInt(v, idx, mismatch)
    case other => throw new IllegalStateException(s"not varint: $other")
  }

  /** proto3 default for an absent NESTED field (top level is strict). */
  private def defaultOf(dt: DataType): Any = dt match {
    case StringType => UTF8String.EMPTY_UTF8
    case BinaryType => Array.emptyByteArray
    case BooleanType => Boolean.box(false)
    case LongType | TimestampType => Long.box(0L)
    case IntegerType | DateType => Int.box(0)
    case DoubleType => Double.box(0.0)
    case FloatType => Float.box(0.0f)
    case ArrayType(_, _) => new GenericArrayData(Array.empty[Any])
    case MapType(_, _, _) =>
      new ArrayBasedMapData(new GenericArrayData(Array.empty[Any]),
        new GenericArrayData(Array.empty[Any]))
    case _: StructType => null // message fields have presence: absent = null
    case other => throw new IllegalStateException(s"no proto3 default for $other")
  }

  def decode(bytes: Array[Byte], schema: StructType): Decoded = {
    if (bytes.length == 0) return Decoded(null, null)
    val n = schema.length
    val scalars = new Array[Any](n)
    val buffers = new Array[scala.collection.mutable.ArrayBuffer[Any]](n)
    val mapKeys = new Array[scala.collection.mutable.ArrayBuffer[Any]](n)
    val mapVals = new Array[scala.collection.mutable.ArrayBuffer[Any]](n)
    val seen = new Array[Boolean](n)
    val mismatch = new Array[Boolean](n)
    try {
      val r = new Reader(bytes, 0, bytes.length)
      while (r.hasMore) {
        val tag = r.readVarint()
        val fieldNum = tag >>> 3 // untruncated: a crafted 2^31+k tag must
        val wire = (tag & 7L).toInt // never wrap onto schema column k
        if (fieldNum <= 0 || fieldNum > MaxFieldNumber)
          throw new Malformed(s"field number $fieldNum out of proto3 range")
        if (fieldNum <= n) {
          val idx = fieldNum.toInt - 1
          decodeKnown(r, wire, idx, schema(idx).dataType,
            scalars, buffers, mapKeys, mapVals, seen, mismatch)
        } else r.skip(wire)
      }
    } catch {
      case m: Malformed => return Decoded("ParseError: " + m.msg, null)
    }
    // Taxonomy order mirrors the JSON path: missing first, then mismatch.
    // Repeated and map fields are EXEMPT from the missing check: proto3
    // gives them no presence — zero occurrences and an empty collection
    // are the same bytes — so absent decodes as empty (ADVICE r5: the
    // encoder's own empty collections must round-trip, not dead-letter).
    val missing = (0 until n).filter { i =>
      !seen(i) && !mismatch(i) && (schema(i).dataType match {
        case _: ArrayType | _: MapType => false
        case _ => true
      })
    }
    if (missing.nonEmpty)
      return Decoded("MissingField: " + missing.map(schema(_).name).mkString(", "), null)
    val bad = (0 until n).filter(mismatch)
    if (bad.nonEmpty)
      return Decoded("TypeMismatch: " + bad.map(schema(_).name).mkString(", "), null)
    val values = new Array[Any](n)
    def elems(store: Array[scala.collection.mutable.ArrayBuffer[Any]], i: Int) =
      if (store(i) == null) Array.empty[Any] else store(i).toArray
    var i = 0
    while (i < n) {
      values(i) = schema(i).dataType match {
        case ArrayType(_, _) => new GenericArrayData(elems(buffers, i))
        case MapType(_, _, _) =>
          new ArrayBasedMapData(new GenericArrayData(elems(mapKeys, i)),
            new GenericArrayData(elems(mapVals, i)))
        case _ => scalars(i)
      }
      i += 1
    }
    Decoded(null, new GenericInternalRow(values))
  }

  /** One occurrence of a top-level schema field. Wrong wire type or a
    * corrupt confined payload marks `mismatch` and resynchronizes at
    * the next tag (the occurrence's bytes are always fully consumed,
    * so one bad field never corrupts the rest of the scan).
    */
  private def decodeKnown(r: Reader, wire: Int, idx: Int, dt: DataType,
      scalars: Array[Any],
      buffers: Array[scala.collection.mutable.ArrayBuffer[Any]],
      mapKeys: Array[scala.collection.mutable.ArrayBuffer[Any]],
      mapVals: Array[scala.collection.mutable.ArrayBuffer[Any]],
      seen: Array[Boolean], mismatch: Array[Boolean]): Unit = {
    def buf(store: Array[scala.collection.mutable.ArrayBuffer[Any]])
        : scala.collection.mutable.ArrayBuffer[Any] = {
      if (store(idx) == null) store(idx) = scala.collection.mutable.ArrayBuffer.empty[Any]
      store(idx)
    }
    dt match {
      case dt2 if isVarintType(dt2) =>
        if (wire != VARINT) { r.skip(wire); mismatch(idx) = true }
        else {
          val v = scalarFromVarint(dt2, r.readVarint(), idx, mismatch)
          if (v != null) { scalars(idx) = v; seen(idx) = true }
        }
      case DoubleType =>
        if (wire != I64) { r.skip(wire); mismatch(idx) = true }
        else {
          scalars(idx) = Double.box(java.lang.Double.longBitsToDouble(r.readFixed64()))
          seen(idx) = true
        }
      case FloatType =>
        if (wire != I32) { r.skip(wire); mismatch(idx) = true }
        else {
          scalars(idx) = Float.box(java.lang.Float.intBitsToFloat(r.readFixed32()))
          seen(idx) = true
        }
      case StringType =>
        if (wire != LEN) { r.skip(wire); mismatch(idx) = true }
        else {
          val s = r.readSlice()
          scalars(idx) = UTF8String.fromBytes(s.b, s.pos, s.end - s.pos)
          seen(idx) = true
        }
      case BinaryType =>
        if (wire != LEN) { r.skip(wire); mismatch(idx) = true }
        else {
          val s = r.readSlice()
          scalars(idx) = java.util.Arrays.copyOfRange(s.b, s.pos, s.end)
          seen(idx) = true
        }
      case ArrayType(et, _) => et match {
        case vt if isVarintType(vt) =>
          if (wire == VARINT) {
            val v = scalarFromVarint(vt, r.readVarint(), idx, mismatch)
            if (v != null) { buf(buffers) += v; seen(idx) = true }
          } else if (wire == LEN) {
            val s = r.readSlice()
            try {
              val tmp = scala.collection.mutable.ArrayBuffer.empty[Any]
              while (s.hasMore) {
                val v = scalarFromVarint(vt, s.readVarint(), idx, mismatch)
                if (v == null) throw new Malformed("packed element out of range")
                tmp += v
              }
              buf(buffers) ++= tmp; seen(idx) = true
            } catch { case _: Malformed => mismatch(idx) = true }
          } else { r.skip(wire); mismatch(idx) = true }
        case DoubleType =>
          if (wire == I64) {
            buf(buffers) += Double.box(java.lang.Double.longBitsToDouble(r.readFixed64()))
            seen(idx) = true
          } else if (wire == LEN) {
            val s = r.readSlice()
            if ((s.end - s.pos) % 8 != 0) mismatch(idx) = true
            else {
              while (s.hasMore)
                buf(buffers) += Double.box(java.lang.Double.longBitsToDouble(s.readFixed64()))
              seen(idx) = true
            }
          } else { r.skip(wire); mismatch(idx) = true }
        case FloatType =>
          if (wire == I32) {
            buf(buffers) += Float.box(java.lang.Float.intBitsToFloat(r.readFixed32()))
            seen(idx) = true
          } else if (wire == LEN) {
            val s = r.readSlice()
            if ((s.end - s.pos) % 4 != 0) mismatch(idx) = true
            else {
              while (s.hasMore)
                buf(buffers) += Float.box(java.lang.Float.intBitsToFloat(s.readFixed32()))
              seen(idx) = true
            }
          } else { r.skip(wire); mismatch(idx) = true }
        case StringType =>
          if (wire != LEN) { r.skip(wire); mismatch(idx) = true }
          else {
            val s = r.readSlice()
            buf(buffers) += UTF8String.fromBytes(s.b, s.pos, s.end - s.pos)
            seen(idx) = true
          }
        case BinaryType =>
          if (wire != LEN) { r.skip(wire); mismatch(idx) = true }
          else {
            val s = r.readSlice()
            buf(buffers) += java.util.Arrays.copyOfRange(s.b, s.pos, s.end)
            seen(idx) = true
          }
        case st: StructType =>
          if (wire != LEN) { r.skip(wire); mismatch(idx) = true }
          else {
            val s = r.readSlice()
            try { buf(buffers) += decodeNested(s, st); seen(idx) = true }
            catch { case _: Malformed => mismatch(idx) = true }
          }
        case other =>
          throw new Malformed(s"unsupported element type $other")
      }
      case MapType(kt, vt, _) =>
        if (wire != LEN) { r.skip(wire); mismatch(idx) = true }
        else {
          val s = r.readSlice()
          try {
            var key: Any = defaultOf(kt)
            var value: Any = defaultOf(vt)
            while (s.hasMore) {
              val tag = s.readVarint()
              val f = tag >>> 3 // untruncated (MaxFieldNumber rationale)
              val w = (tag & 7L).toInt
              if (f <= 0 || f > MaxFieldNumber)
                throw new Malformed(s"field number $f out of proto3 range")
              if (f == 1L) key = decodeNestedValue(s, w, kt)
              else if (f == 2L) value = decodeNestedValue(s, w, vt)
              else s.skip(w)
            }
            // proto3 map semantics: the LAST entry for a key wins —
            // duplicate keys must not reach the MapData (element_at and
            // map equality assume unique keys; ADVICE r5).
            val existing = buf(mapKeys).indexOf(key)
            if (existing >= 0) buf(mapVals)(existing) = value
            else { buf(mapKeys) += key; buf(mapVals) += value }
            seen(idx) = true
          } catch { case _: Malformed => mismatch(idx) = true }
        }
      case st: StructType =>
        if (wire != LEN) { r.skip(wire); mismatch(idx) = true }
        else {
          val s = r.readSlice()
          try { scalars(idx) = decodeNested(s, st); seen(idx) = true }
          catch { case _: Malformed => mismatch(idx) = true }
        }
      case other =>
        throw new Malformed(s"unsupported schema type $other")
    }
  }

  /** Nested submessage decode: proto3 defaults for absent fields, no
    * missing/mismatch taxonomy (a structural or type error anywhere in
    * the slice throws Malformed, which the caller records as a
    * TypeMismatch on the OUTER field).
    */
  private def decodeNested(r: Reader, schema: StructType): InternalRow = {
    val n = schema.length
    val values = new Array[Any](n)
    val listBufs = new Array[scala.collection.mutable.ArrayBuffer[Any]](n)
    var i = 0
    while (i < n) {
      values(i) = defaultOf(schema(i).dataType)
      i += 1
    }
    while (r.hasMore) {
      val tag = r.readVarint()
      val fieldNum = tag >>> 3 // untruncated (MaxFieldNumber rationale)
      val wire = (tag & 7L).toInt
      if (fieldNum <= 0 || fieldNum > MaxFieldNumber)
        throw new Malformed(s"field number $fieldNum out of proto3 range")
      if (fieldNum <= n) {
        val idx = fieldNum.toInt - 1
        schema(idx).dataType match {
          case ArrayType(et, _) =>
            if (listBufs(idx) == null)
              listBufs(idx) = scala.collection.mutable.ArrayBuffer.empty[Any]
            et match {
              case vt if isVarintType(vt) && wire == LEN =>
                val s = r.readSlice()
                while (s.hasMore) listBufs(idx) += strictVarint(vt, s.readVarint())
              case _ => listBufs(idx) += decodeNestedValue(r, wire, et)
            }
            values(idx) = new GenericArrayData(listBufs(idx).toArray)
          case dt => values(idx) = decodeNestedValue(r, wire, dt)
        }
      } else r.skip(wire)
    }
    new GenericInternalRow(values)
  }

  private def strictVarint(dt: DataType, v: Long): Any = dt match {
    case BooleanType => Boolean.box(v != 0L)
    case LongType | TimestampType => Long.box(v)
    case IntegerType | DateType =>
      if (v < Int.MinValue || v > Int.MaxValue) throw new Malformed("int32 out of range")
      Int.box(v.toInt)
    case other => throw new IllegalStateException(s"not varint: $other")
  }

  /** One nested (map-entry / submessage) value; wrong wire type throws. */
  private def decodeNestedValue(r: Reader, wire: Int, dt: DataType): Any = dt match {
    case dt2 if isVarintType(dt2) =>
      if (wire != VARINT) throw new Malformed("wire type mismatch")
      strictVarint(dt2, r.readVarint())
    case DoubleType =>
      if (wire != I64) throw new Malformed("wire type mismatch")
      Double.box(java.lang.Double.longBitsToDouble(r.readFixed64()))
    case FloatType =>
      if (wire != I32) throw new Malformed("wire type mismatch")
      Float.box(java.lang.Float.intBitsToFloat(r.readFixed32()))
    case StringType =>
      if (wire != LEN) throw new Malformed("wire type mismatch")
      val s = r.readSlice()
      UTF8String.fromBytes(s.b, s.pos, s.end - s.pos)
    case BinaryType =>
      if (wire != LEN) throw new Malformed("wire type mismatch")
      val s = r.readSlice()
      java.util.Arrays.copyOfRange(s.b, s.pos, s.end)
    case st: StructType =>
      if (wire != LEN) throw new Malformed("wire type mismatch")
      decodeNested(r.readSlice(), st)
    case other => throw new Malformed(s"unsupported nested type $other")
  }
}

/** Serializable schema-bound codec handle — the single reference object
  * the codegen'd expressions call through (same pattern as Spark's own
  * `Invoke`-style fallbacks: one virtual call per row, the hot loop
  * stays inside whole-stage codegen).
  */
final class ProtoBound(val schema: StructType) extends Serializable {
  def encode(row: InternalRow): Array[Byte] = ProtoCodec.encode(row, schema)
  def decode(bytes: Array[Byte]): InternalRow = {
    val d = ProtoCodec.decode(bytes, schema)
    new GenericInternalRow(Array[Any](
      if (d.error == null) null else UTF8String.fromString(d.error), d.value))
  }
}
