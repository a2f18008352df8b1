package graft.operators

import java.io.{InputStream, OutputStream}

/** Hand-rolled protobuf wire codec for gravity's filter-plugin contract
  * (protocol/msgpb/message.proto; generated form
  * pkg/protocol/msgpb/message.pb.go) — the same no-dependency approach as
  * [[graft.sources.TidbProto]]. A user filter binary written against
  * gravity's msgpb schema exchanges byte-identical messages with this
  * codec:
  *
  *   Msg           { 1:version 2:database 3:table 4:msgType
  *                   5:google.protobuf.Timestamp 6:DMLMsg 7:DDLMsg }
  *   DMLMsg        { 1:Op 2:data 3:old 4:pks — map<string, Any> }
  *   DDLMsg        { 2:SQL }
  *   FilterRequest { 1:Msg }
  *   FilterResponse{ 1:Msg 2:continueNext 3:StringValue error }
  *
  * Scalar payloads ride google.protobuf.Any exactly like
  * pkg/core/encoding/pb.go InterfaceValueToPB: each value is a wrapped
  * well-known type (Int32Value … BytesValue, Timestamp for time values,
  * Empty for NULL) with the type.googleapis.com/ type_url prefix.
  * (pb.go's float case matches the UN-prefixed url — a reference quirk;
  * this decoder tolerates both forms.)
  *
  * The reference transports these over gRPC (hashicorp go-plugin,
  * pkg/filters/grpc_sidecar_filter.go:83-133). The in-sandbox transport is
  * varint-length-prefixed frames on a child process's stdin/stdout
  * ([[MsgPbSidecarFilter]]) — same messages, same synchronous
  * one-response-per-request contract, minus the HTTP/2 stack.
  */
object MsgPb {

  // ---------------------------------------------------------------- values

  /** The Any-wrapped scalar set of pkg/core/encoding/pb.go. */
  sealed trait PbValue
  object PbValue {
    final case class I32(v: Int) extends PbValue // Int32Value  (go int8/int16)
    final case class I64(v: Long) extends PbValue // Int64Value  (go int/32/64)
    final case class U32(v: Long) extends PbValue // UInt32Value
    final case class U64(v: Long) extends PbValue // UInt64Value (bits in Long)
    final case class F32(v: Float) extends PbValue // FloatValue
    final case class F64(v: Double) extends PbValue // DoubleValue
    final case class Str(v: String) extends PbValue // StringValue
    final case class Bool(v: Boolean) extends PbValue // BoolValue
    final case class Bytes(v: Vector[Byte]) extends PbValue // BytesValue
    final case class Time(seconds: Long, nanos: Int) extends PbValue // Timestamp
    case object Null extends PbValue // Empty
  }

  /** map<string, Any> with deterministic (insertion) order preserved. */
  type PbMap = Seq[(String, PbValue)]

  final case class Dml(op: String, data: PbMap, old: PbMap, pks: PbMap)
  final case class Ddl(sql: String)
  final case class Msg(
      version: String = "",
      database: String = "",
      table: String = "",
      msgType: String = "",
      tsSeconds: Long = 0L,
      tsNanos: Int = 0,
      dml: Option[Dml] = None,
      ddl: Option[Ddl] = None)
  final case class FilterResponse(
      msg: Option[Msg], continueNext: Boolean, error: Option[String])

  // ------------------------------------------------------- wire primitives

  private final class Writer {
    private val out = new java.io.ByteArrayOutputStream(128)
    def result(): Array[Byte] = out.toByteArray
    def varint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt)
    }
    private def tag(field: Int, wire: Int): Unit = varint((field.toLong << 3) | wire)
    def vint(field: Int, v: Long): Unit =
      if (v != 0) { tag(field, 0); varint(v) }
    def bool(field: Int, b: Boolean): Unit = if (b) { tag(field, 0); varint(1) }
    def fixed32(field: Int, bits: Int): Unit = {
      tag(field, 5)
      out.write(bits & 0xff); out.write((bits >>> 8) & 0xff)
      out.write((bits >>> 16) & 0xff); out.write((bits >>> 24) & 0xff)
    }
    def fixed64(field: Int, bits: Long): Unit = {
      tag(field, 1)
      var i = 0
      while (i < 8) { out.write(((bits >>> (8 * i)) & 0xff).toInt); i += 1 }
    }
    def bytes(field: Int, b: Array[Byte]): Unit = {
      tag(field, 2); varint(b.length.toLong); out.write(b, 0, b.length)
    }
    def str(field: Int, s: String): Unit =
      if (s.nonEmpty) bytes(field, s.getBytes("UTF-8"))
    /** Embedded message — emitted even when empty iff `always` (proto3
      * emits a present message field regardless of content).
      */
    def embedded(field: Int, b: Array[Byte], always: Boolean = true): Unit =
      if (always || b.nonEmpty) bytes(field, b)
  }

  private final class Reader(buf: Array[Byte], start: Int, end: Int) {
    private var pos = start
    def hasNext: Boolean = pos < end
    def readVarint(): Long = {
      var shift = 0; var res = 0L
      var b = buf(pos) & 0xff; pos += 1
      while ((b & 0x80) != 0) {
        res |= (b & 0x7fL) << shift; shift += 7
        b = buf(pos) & 0xff; pos += 1
      }
      res | ((b & 0x7fL) << shift)
    }
    def readTag(): (Int, Int) = {
      val v = readVarint(); ((v >>> 3).toInt, (v & 7).toInt)
    }
    def readFixed32(): Int = {
      val v = (buf(pos) & 0xff) | ((buf(pos + 1) & 0xff) << 8) |
        ((buf(pos + 2) & 0xff) << 16) | ((buf(pos + 3) & 0xff) << 24)
      pos += 4; v
    }
    def readFixed64(): Long = {
      var v = 0L; var i = 0
      while (i < 8) { v |= (buf(pos + i) & 0xffL) << (8 * i); i += 1 }
      pos += 8; v
    }
    def readSpan(): (Int, Int) = {
      val len = readVarint().toInt; val s = pos; pos += len; (s, s + len)
    }
    def readString(): String = {
      val (s, e) = readSpan(); new String(buf, s, e - s, "UTF-8")
    }
    def readBytes(): Array[Byte] = {
      val (s, e) = readSpan(); java.util.Arrays.copyOfRange(buf, s, e)
    }
    def skip(wire: Int): Unit = wire match {
      case 0 => readVarint()
      case 1 => pos += 8
      case 2 => val len = readVarint().toInt; pos += len
      case 5 => pos += 4
      case w => throw new IllegalArgumentException(s"msgpb: unsupported wire type $w")
    }
  }

  // ----------------------------------------------------------- Any codec

  private val UrlPrefix = "type.googleapis.com/"

  private def wrapperBytes(v: PbValue): (String, Array[Byte]) = {
    val w = new Writer
    val name = v match {
      case PbValue.I32(x) => w.vint(1, x.toLong); "google.protobuf.Int32Value"
      case PbValue.I64(x) => w.vint(1, x); "google.protobuf.Int64Value"
      case PbValue.U32(x) => w.vint(1, x & 0xffffffffL); "google.protobuf.UInt32Value"
      case PbValue.U64(x) => w.vint(1, x); "google.protobuf.UInt64Value"
      case PbValue.F32(x) =>
        if (java.lang.Float.floatToRawIntBits(x) != 0) w.fixed32(1, java.lang.Float.floatToRawIntBits(x))
        "google.protobuf.FloatValue"
      case PbValue.F64(x) =>
        if (java.lang.Double.doubleToRawLongBits(x) != 0L) w.fixed64(1, java.lang.Double.doubleToRawLongBits(x))
        "google.protobuf.DoubleValue"
      case PbValue.Str(x) => w.str(1, x); "google.protobuf.StringValue"
      case PbValue.Bool(x) => w.bool(1, x); "google.protobuf.BoolValue"
      case PbValue.Bytes(x) =>
        if (x.nonEmpty) w.bytes(1, x.toArray)
        "google.protobuf.BytesValue"
      case PbValue.Time(s, n) =>
        w.vint(1, s); w.vint(2, n.toLong); "google.protobuf.Timestamp"
      case PbValue.Null => "google.protobuf.Empty"
    }
    (name, w.result())
  }

  private def encodeAny(v: PbValue): Array[Byte] = {
    val (name, payload) = wrapperBytes(v)
    val w = new Writer
    w.str(1, UrlPrefix + name)
    // Any.value: emitted even when the wrapped default is empty bytes
    w.embedded(2, payload)
    w.result()
  }

  private def decodeAny(buf: Array[Byte], s: Int, e: Int): PbValue = {
    val r = new Reader(buf, s, e)
    var url = ""; var vs = 0; var ve = 0
    while (r.hasNext) r.readTag() match {
      case (1, _) => url = r.readString()
      case (2, _) => val span = r.readSpan(); vs = span._1; ve = span._2
      case (_, w) => r.skip(w)
    }
    val name = if (url.startsWith(UrlPrefix)) url.substring(UrlPrefix.length) else url
    val r2 = new Reader(buf, vs, ve)
    def scalarVarint(): Long = {
      var v = 0L
      while (r2.hasNext) r2.readTag() match {
        case (1, 0) => v = r2.readVarint()
        case (_, w) => r2.skip(w)
      }
      v
    }
    name match {
      case "google.protobuf.Int32Value" => PbValue.I32(scalarVarint().toInt)
      case "google.protobuf.Int64Value" => PbValue.I64(scalarVarint())
      case "google.protobuf.UInt32Value" => PbValue.U32(scalarVarint() & 0xffffffffL)
      case "google.protobuf.UInt64Value" => PbValue.U64(scalarVarint())
      case "google.protobuf.BoolValue" => PbValue.Bool(scalarVarint() != 0)
      case "google.protobuf.FloatValue" =>
        var bits = 0
        while (r2.hasNext) r2.readTag() match {
          case (1, 5) => bits = r2.readFixed32()
          case (_, w) => r2.skip(w)
        }
        PbValue.F32(java.lang.Float.intBitsToFloat(bits))
      case "google.protobuf.DoubleValue" =>
        var bits = 0L
        while (r2.hasNext) r2.readTag() match {
          case (1, 1) => bits = r2.readFixed64()
          case (_, w) => r2.skip(w)
        }
        PbValue.F64(java.lang.Double.longBitsToDouble(bits))
      case "google.protobuf.StringValue" =>
        var v = ""
        while (r2.hasNext) r2.readTag() match {
          case (1, 2) => v = r2.readString()
          case (_, w) => r2.skip(w)
        }
        PbValue.Str(v)
      case "google.protobuf.BytesValue" =>
        var v = Array.emptyByteArray
        while (r2.hasNext) r2.readTag() match {
          case (1, 2) => v = r2.readBytes()
          case (_, w) => r2.skip(w)
        }
        PbValue.Bytes(v.toVector)
      case "google.protobuf.Timestamp" =>
        var sec = 0L; var nan = 0L
        while (r2.hasNext) r2.readTag() match {
          case (1, 0) => sec = r2.readVarint()
          case (2, 0) => nan = r2.readVarint()
          case (_, w) => r2.skip(w)
        }
        PbValue.Time(sec, nan.toInt)
      case "google.protobuf.Empty" => PbValue.Null
      case other => throw new IllegalArgumentException(s"msgpb: unknown Any type: $other")
    }
  }

  // ------------------------------------------------------------ Msg codec

  private def encodeMapEntry(key: String, v: PbValue): Array[Byte] = {
    val w = new Writer
    w.str(1, key)
    w.embedded(2, encodeAny(v))
    w.result()
  }

  private def encodeDml(d: Dml): Array[Byte] = {
    val w = new Writer
    w.str(1, d.op)
    d.data.foreach { case (k, v) => w.embedded(2, encodeMapEntry(k, v)) }
    d.old.foreach { case (k, v) => w.embedded(3, encodeMapEntry(k, v)) }
    d.pks.foreach { case (k, v) => w.embedded(4, encodeMapEntry(k, v)) }
    w.result()
  }

  private def decodeMapEntry(buf: Array[Byte], s: Int, e: Int): (String, PbValue) = {
    val r = new Reader(buf, s, e)
    var k = ""; var v: PbValue = PbValue.Null
    while (r.hasNext) r.readTag() match {
      case (1, 2) => k = r.readString()
      case (2, 2) => val span = r.readSpan(); v = decodeAny(buf, span._1, span._2)
      case (_, w) => r.skip(w)
    }
    (k, v)
  }

  private def decodeDml(buf: Array[Byte], s: Int, e: Int): Dml = {
    val r = new Reader(buf, s, e)
    var op = ""
    val data = Seq.newBuilder[(String, PbValue)]
    val old = Seq.newBuilder[(String, PbValue)]
    val pks = Seq.newBuilder[(String, PbValue)]
    while (r.hasNext) r.readTag() match {
      case (1, 2) => op = r.readString()
      case (2, 2) => val sp = r.readSpan(); data += decodeMapEntry(buf, sp._1, sp._2)
      case (3, 2) => val sp = r.readSpan(); old += decodeMapEntry(buf, sp._1, sp._2)
      case (4, 2) => val sp = r.readSpan(); pks += decodeMapEntry(buf, sp._1, sp._2)
      case (_, w) => r.skip(w)
    }
    Dml(op, data.result(), old.result(), pks.result())
  }

  def encodeMsg(m: Msg): Array[Byte] = {
    val w = new Writer
    w.str(1, m.version)
    w.str(2, m.database)
    w.str(3, m.table)
    w.str(4, m.msgType)
    val ts = new Writer
    ts.vint(1, m.tsSeconds); ts.vint(2, m.tsNanos.toLong)
    // gravity always sets the timestamp pointer → field 5 always present
    w.embedded(5, ts.result())
    m.dml.foreach(d => w.embedded(6, encodeDml(d)))
    m.ddl.foreach { d =>
      val dw = new Writer; dw.str(2, d.sql); w.embedded(7, dw.result())
    }
    w.result()
  }

  def decodeMsg(b: Array[Byte]): Msg = decodeMsgSpan(b, 0, b.length)

  private def decodeMsgSpan(buf: Array[Byte], s: Int, e: Int): Msg = {
    val r = new Reader(buf, s, e)
    var m = Msg()
    while (r.hasNext) r.readTag() match {
      case (1, 2) => m = m.copy(version = r.readString())
      case (2, 2) => m = m.copy(database = r.readString())
      case (3, 2) => m = m.copy(table = r.readString())
      case (4, 2) => m = m.copy(msgType = r.readString())
      case (5, 2) =>
        val sp = r.readSpan()
        val tr = new Reader(buf, sp._1, sp._2)
        while (tr.hasNext) tr.readTag() match {
          case (1, 0) => m = m.copy(tsSeconds = tr.readVarint())
          case (2, 0) => m = m.copy(tsNanos = tr.readVarint().toInt)
          case (_, w) => tr.skip(w)
        }
      case (6, 2) =>
        val sp = r.readSpan(); m = m.copy(dml = Some(decodeDml(buf, sp._1, sp._2)))
      case (7, 2) =>
        val sp = r.readSpan()
        val dr = new Reader(buf, sp._1, sp._2)
        var sql = ""
        while (dr.hasNext) dr.readTag() match {
          case (2, 2) => sql = dr.readString()
          case (_, w) => dr.skip(w)
        }
        m = m.copy(ddl = Some(Ddl(sql)))
      case (_, w) => r.skip(w)
    }
    m
  }

  def encodeFilterRequest(m: Msg): Array[Byte] = {
    val w = new Writer
    w.embedded(1, encodeMsg(m))
    w.result()
  }

  def decodeFilterRequest(b: Array[Byte]): Msg = {
    val r = new Reader(b, 0, b.length)
    var m = Msg()
    while (r.hasNext) r.readTag() match {
      case (1, 2) => val sp = r.readSpan(); m = decodeMsgSpan(b, sp._1, sp._2)
      case (_, w) => r.skip(w)
    }
    m
  }

  def encodeFilterResponse(rsp: FilterResponse): Array[Byte] = {
    val w = new Writer
    rsp.msg.foreach(m => w.embedded(1, encodeMsg(m)))
    w.bool(2, rsp.continueNext)
    rsp.error.foreach { e =>
      val ew = new Writer; ew.str(1, e); w.embedded(3, ew.result())
    }
    w.result()
  }

  def decodeFilterResponse(b: Array[Byte]): FilterResponse = {
    val r = new Reader(b, 0, b.length)
    var msg: Option[Msg] = None; var cont = false; var err: Option[String] = None
    while (r.hasNext) r.readTag() match {
      case (1, 2) => val sp = r.readSpan(); msg = Some(decodeMsgSpan(b, sp._1, sp._2))
      case (2, 0) => cont = r.readVarint() != 0
      case (3, 2) =>
        val sp = r.readSpan()
        val er = new Reader(b, sp._1, sp._2)
        while (er.hasNext) er.readTag() match {
          case (1, 2) => err = Some(er.readString())
          case (_, w) => er.skip(w)
        }
      case (_, w) => r.skip(w)
    }
    FilterResponse(msg, cont, err)
  }

  // --------------------------------- envelope row <-> PbValue helpers

  /** A map<string,string> envelope column as an Any-wrapped PbMap —
    * shared by the stdio and grpc sidecar filters.
    */
  def rowStrMap(row: org.apache.spark.sql.Row, i: Int): PbMap =
    if (i < 0 || row.isNullAt(i)) Seq.empty
    else row.getMap[String, String](i).toSeq.map { case (k, v) =>
      k -> (if (v == null) PbValue.Null else PbValue.Str(v): PbValue)
    }

  /** Render any scalar a filter binary may answer with back into the
    * string-typed envelope (mirrors pkg/core/encoding/pb.go's value set).
    */
  def valueToString(v: PbValue): String = v match {
    case PbValue.Str(s) => s
    case PbValue.Null => null
    case PbValue.I32(x) => x.toString
    case PbValue.I64(x) => x.toString
    case PbValue.U32(x) => x.toString
    case PbValue.U64(x) => java.lang.Long.toUnsignedString(x)
    case PbValue.F32(x) => x.toString
    case PbValue.F64(x) => x.toString
    case PbValue.Bool(x) => x.toString
    case PbValue.Bytes(x) => java.util.Base64.getEncoder.encodeToString(x.toArray)
    case PbValue.Time(s, n) => java.time.Instant.ofEpochSecond(s, n.toLong).toString
  }

  // ------------------------------------------- Configure rpc (grpc only)

  /** ConfigureRequest{ map<string, Any> data = 1 } — the first rpc
    * go-plugin's host makes after Dispense (pkg/filters/grpc/client.go:35-50).
    */
  def encodeConfigureRequest(data: PbMap): Array[Byte] = {
    val w = new Writer
    data.foreach { case (k, v) => w.embedded(1, encodeMapEntry(k, v)) }
    w.result()
  }

  def decodeConfigureRequest(b: Array[Byte]): PbMap = {
    val r = new Reader(b, 0, b.length)
    val data = Seq.newBuilder[(String, PbValue)]
    while (r.hasNext) r.readTag() match {
      case (1, 2) => val sp = r.readSpan(); data += decodeMapEntry(b, sp._1, sp._2)
      case (_, w) => r.skip(w)
    }
    data.result()
  }

  /** ConfigureResponse{ StringValue error = 1 }. */
  def encodeConfigureResponse(error: Option[String]): Array[Byte] = {
    val w = new Writer
    error.foreach { e =>
      val ew = new Writer; ew.str(1, e); w.embedded(1, ew.result())
    }
    w.result()
  }

  def decodeConfigureResponse(b: Array[Byte]): Option[String] = {
    val r = new Reader(b, 0, b.length)
    var err: Option[String] = None
    while (r.hasNext) r.readTag() match {
      case (1, 2) =>
        val sp = r.readSpan()
        val er = new Reader(b, sp._1, sp._2)
        while (er.hasNext) er.readTag() match {
          case (1, 2) => err = Some(er.readString())
          case (_, w) => er.skip(w)
        }
      case (_, w) => r.skip(w)
    }
    err
  }

  // ------------------------------------------------------------- framing

  /** Frames beyond this are protocol corruption, not data (a single Msg
    * is a CDC row — even a pathological one fits well under 64 MB).
    */
  val MaxFrameBytes: Long = 64L * 1024 * 1024

  /** varint length prefix + body — the stream framing both sides of the
    * stdin/stdout transport use.
    */
  def writeFrame(out: OutputStream, body: Array[Byte]): Unit = {
    var v = body.length.toLong
    while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
    out.write(body)
  }

  /** None at clean EOF on a frame boundary; throws on a truncated frame. */
  def readFrame(in: InputStream): Option[Array[Byte]] = {
    var first = in.read()
    if (first < 0) return None
    var len = 0L; var shift = 0
    while ((first & 0x80) != 0) {
      len |= (first & 0x7fL) << shift; shift += 7
      first = in.read()
      if (first < 0) throw new java.io.EOFException("msgpb: truncated frame length")
    }
    len |= (first & 0x7fL) << shift
    // garbage on the pipe (stray println, crash dump) parsed as a varint
    // must fail as a protocol error, not a negative-size allocation or a
    // multi-GB OOM
    if (len < 0 || len > MaxFrameBytes) throw new java.io.EOFException(
      s"msgpb: implausible frame length $len (max $MaxFrameBytes)")
    val body = new Array[Byte](len.toInt)
    var off = 0
    while (off < body.length) {
      val n = in.read(body, off, body.length - off)
      if (n < 0) throw new java.io.EOFException(
        s"msgpb: truncated frame body ($off of ${body.length} bytes)")
      off += n
    }
    Some(body)
  }
}
