package graft.sources

import graft.core.JsonText

/** Decoder for MySQL's binary JSON column format ("jsonb": the on-disk /
  * in-binlog representation of `JSON` columns, documented in the server's
  * json_binary.h and reproduced by every replication client).
  *
  * Layout: one type byte, then a type-specific payload. Containers store a
  * count and total size, then fixed-width scalar/offset entries (so lookups
  * can binary-search without parsing), then the variable-size keys and
  * values; all offsets are relative to the start of the container payload.
  * Small containers use 2-byte counts/offsets, large use 4-byte. Literals
  * and 16-bit ints are inlined in the entry itself (large containers also
  * inline 32-bit ints).
  *
  * The reference treats JSON columns as strings downstream
  * (pkg/inputs/mysqlstream/msg.go:239, schema_store/utils.go:208), so this
  * decoder renders straight to JSON text. Unknown opaque types fail loudly
  * (same posture as the Mongo BSON codec) — a silent wrong value in a CDC
  * stream is worse than a crash.
  */
object JsonBinary {

  private val SmallObject = 0x00; private val LargeObject = 0x01
  private val SmallArray = 0x02; private val LargeArray = 0x03
  private val Literal = 0x04
  private val Int16 = 0x05; private val UInt16 = 0x06
  private val Int32 = 0x07; private val UInt32 = 0x08
  private val Int64 = 0x09; private val UInt64 = 0x0a
  private val DoubleT = 0x0b; private val StringT = 0x0c
  private val Opaque = 0x0f

  /** Binary document → JSON text. Empty input is SQL NULL-ish → "null". */
  def text(b: Array[Byte]): String =
    if (b.length == 0) "null"
    else {
      val sb = new java.lang.StringBuilder
      writeValue(b, b(0) & 0xff, 1, sb)
      sb.toString
    }

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def i16(b: Array[Byte], o: Int): Int = u16(b, o).toShort.toInt
  private def u32(b: Array[Byte], o: Int): Long =
    (u16(b, o).toLong) | (u16(b, o + 2).toLong << 16)
  private def i32(b: Array[Byte], o: Int): Int = u32(b, o).toInt
  private def u64(b: Array[Byte], o: Int): Long =
    u32(b, o) | (u32(b, o + 4) << 32)

  /** Variable-length size: 7 bits per byte little-endian, high bit is the
    * continuation flag. Returns (value, next offset).
    */
  private def varlen(b: Array[Byte], o: Int): (Int, Int) = {
    var v = 0L; var shift = 0; var p = o
    var cont = true
    while (cont) {
      val x = b(p) & 0xff
      v |= (x & 0x7f).toLong << shift
      cont = (x & 0x80) != 0
      shift += 7; p += 1
      require(shift <= 35, "jsonb: runaway varlen length")
    }
    (v.toInt, p)
  }

  /** Append the value of entry type `tpe` whose payload starts at `off`. */
  private def writeValue(b: Array[Byte], tpe: Int, off: Int,
      sb: java.lang.StringBuilder): Unit = tpe match {
    case SmallObject => writeContainer(b, off, large = false, obj = true, sb)
    case LargeObject => writeContainer(b, off, large = true, obj = true, sb)
    case SmallArray => writeContainer(b, off, large = false, obj = false, sb)
    case LargeArray => writeContainer(b, off, large = true, obj = false, sb)
    case Literal => sb.append((b(off) & 0xff) match {
      case 0 => "null"
      case 1 => "true"
      case 2 => "false"
      case x => throw new UnsupportedOperationException(s"jsonb literal $x")
    })
    case Int16 => sb.append(i16(b, off))
    case UInt16 => sb.append(u16(b, off))
    case Int32 => sb.append(i32(b, off))
    case UInt32 => sb.append(u32(b, off))
    case Int64 => sb.append(u64(b, off))
    case UInt64 => sb.append(java.lang.Long.toUnsignedString(u64(b, off)))
    case DoubleT =>
      val d = java.lang.Double.longBitsToDouble(u64(b, off))
      require(!d.isNaN && !d.isInfinite, "jsonb: non-finite double")
      sb.append(d)
    case StringT =>
      val (len, p) = varlen(b, off)
      sb.append(JsonText.str(new String(b, p, len, "UTF-8")))
    case Opaque =>
      // payload: 1 byte mysql field type, varlen length, data. DECIMAL is
      // the one opaque routinely produced by the server (CAST/computed
      // JSON); its data is (precision, scale, packed decimal) — reuse the
      // row-image decimal decoder. Temporal opaques fail loudly.
      val fieldType = b(off) & 0xff
      val (len, p) = varlen(b, off + 1)
      fieldType match {
        case 246 =>
          val r = new BinlogWire.ByteReader(java.util.Arrays.copyOfRange(b, p, p + len))
          val precision = r.u8(); val scale = r.u8()
          sb.append(BinlogWire.decodeDecimal(r, precision, scale).toPlainString)
        case other => throw new UnsupportedOperationException(
          s"jsonb opaque field type $other not supported (decimal=246 is)")
      }
    case other =>
      throw new UnsupportedOperationException(s"jsonb value type $other")
  }

  private def writeContainer(b: Array[Byte], base: Int, large: Boolean,
      obj: Boolean, sb: java.lang.StringBuilder): Unit = {
    val w = if (large) 4 else 2
    def offAt(o: Int): Int = if (large) u32(b, o).toInt else u16(b, o)
    val count = offAt(base)
    // total size at base + w is only needed for bounds checks; offsets are
    // relative to `base`
    val keyEntries = base + 2 * w
    val valueEntries = keyEntries + (if (obj) count * (w + 2) else 0)
    sb.append(if (obj) '{' else '[')
    var i = 0
    while (i < count) {
      if (i > 0) sb.append(',')
      if (obj) {
        val ke = keyEntries + i * (w + 2)
        val keyOff = offAt(ke)
        val keyLen = u16(b, ke + w)
        sb.append(JsonText.str(new String(b, base + keyOff, keyLen, "UTF-8")))
        sb.append(':')
      }
      val ve = valueEntries + i * (w + 1)
      val vt = b(ve) & 0xff
      val inlined = vt match {
        case Literal | Int16 | UInt16 => true
        case Int32 | UInt32 => large // 4-byte slot fits them only when large
        case _ => false
      }
      if (inlined) writeValue(b, vt, ve + 1, sb)
      else writeValue(b, vt, base + offAt(ve + 1), sb)
      i += 1
    }
    sb.append(if (obj) '}' else ']')
  }
}
