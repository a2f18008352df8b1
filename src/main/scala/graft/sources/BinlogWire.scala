package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, InputStream, OutputStream}

/** MySQL client/server + replication (binlog) wire protocol, hand-rolled
  * from the public protocol documentation — the network layer the
  * reference gets from go-mysql's replication.BinlogSyncer
  * (pkg/inputs/mysqlstream/binlog_tailer.go:153-577 consumes it; this
  * closes the one layer that module delegated to a library). Same
  * no-dependency approach as [[TidbProto]] and [[graft.operators.MsgPb]].
  *
  * Covered: packet framing, HandshakeV10 / HandshakeResponse41 with
  * mysql_native_password auth, COM_QUERY with OK/ERR, COM_BINLOG_DUMP,
  * and the v4 binlog event stream: FORMAT_DESCRIPTION, ROTATE, QUERY,
  * TABLE_MAP, WRITE/UPDATE/DELETE_ROWS v1+v2, XID. Row values decode for
  * the production type set (TINY/SHORT/INT24/LONG/LONGLONG, FLOAT/
  * DOUBLE, NEWDECIMAL packed groups, VARCHAR/VAR_STRING/STRING, BLOB,
  * DATE, YEAR, DATETIME2/TIMESTAMP2/TIME2 incl. fractional seconds and
  * TIME2's negative borrow form, NULL); signedness is NOT on
  * the binlog wire — it comes from the schema store, exactly why the
  * reference pairs the tailer with one (MySqlTypes.unsignedFixup is the
  * downstream fixup). Unsupported column types fail loudly with the
  * type id, never decode garbage. Checksums: the client pins
  * @master_binlog_checksum='NONE' at registration like real replicas.
  */
object BinlogWire {

  // ------------------------------------------------------------ buffers

  final class ByteReader(val buf: Array[Byte], var pos: Int = 0) {
    def remaining: Int = buf.length - pos
    def u8(): Int = { val v = buf(pos) & 0xff; pos += 1; v }
    def u16(): Int = u8() | (u8() << 8)
    def u24(): Int = u8() | (u8() << 8) | (u8() << 16)
    def u32(): Long = u24().toLong | ((u8().toLong) << 24)
    def u48(): Long = u32() | (u8().toLong << 32) | (u8().toLong << 40)
    def u64(): Long = u32() | (u32() << 32)
    def i8(): Int = { val v = buf(pos).toInt; pos += 1; v }
    def i16(): Int = u16().toShort.toInt
    def i24(): Int = { val v = u24(); if ((v & 0x800000) != 0) v | 0xff000000 else v }
    def i32(): Int = u32().toInt
    def bytes(n: Int): Array[Byte] = {
      val out = java.util.Arrays.copyOfRange(buf, pos, pos + n); pos += n; out
    }
    def strN(n: Int): String = new String(bytes(n), "UTF-8")
    def strNul(): String = {
      val start = pos
      while (buf(pos) != 0) pos += 1
      val s = new String(buf, start, pos - start, "UTF-8"); pos += 1; s
    }
    def strEof(): String = { val s = new String(buf, pos, buf.length - pos, "UTF-8"); pos = buf.length; s }
    /** length-encoded integer */
    def lenenc(): Long = u8() match {
      case 0xfb => -1L // NULL marker in result contexts
      case 0xfc => u16().toLong
      case 0xfd => u24().toLong
      case 0xfe => u64()
      case v => v.toLong
    }
  }

  final class ByteWriter {
    private val out = new java.io.ByteArrayOutputStream(64)
    def result(): Array[Byte] = out.toByteArray
    def u8(v: Int): this.type = { out.write(v & 0xff); this }
    def u16(v: Int): this.type = { u8(v); u8(v >> 8) }
    def u24(v: Int): this.type = { u8(v); u8(v >> 8); u8(v >> 16) }
    def u32(v: Long): this.type = { u24(v.toInt); u8((v >> 24).toInt) }
    def u48(v: Long): this.type = { u32(v); u8((v >> 32).toInt); u8((v >> 40).toInt) }
    def u64(v: Long): this.type = { u32(v & 0xffffffffL); u32(v >>> 32) }
    def bytes(b: Array[Byte]): this.type = { out.write(b); this }
    def strNul(s: String): this.type = { bytes(s.getBytes("UTF-8")); u8(0) }
    def str(s: String): this.type = bytes(s.getBytes("UTF-8"))
    def lenenc(v: Long): this.type =
      if (v < 251) u8(v.toInt)
      else if (v < (1 << 16)) { u8(0xfc); u16(v.toInt) }
      else if (v < (1 << 24)) { u8(0xfd); u24(v.toInt) }
      else { u8(0xfe); u64(v) }
  }

  // ----------------------------------------------------- packet framing

  /** 3-byte LE length + 1-byte sequence, then the payload. */
  def readPacket(in: InputStream): (Int, Array[Byte]) = {
    def b(): Int = {
      val v = in.read()
      if (v < 0) throw new java.io.EOFException("mysql: connection closed")
      v
    }
    val len = b() | (b() << 8) | (b() << 16)
    val seq = b()
    val payload = new Array[Byte](len)
    var off = 0
    while (off < len) {
      val n = in.read(payload, off, len - off)
      if (n < 0) throw new java.io.EOFException("mysql: truncated packet")
      off += n
    }
    (seq, payload)
  }

  def writePacket(out: OutputStream, seq: Int, payload: Array[Byte]): Unit = {
    out.write(payload.length & 0xff)
    out.write((payload.length >> 8) & 0xff)
    out.write((payload.length >> 16) & 0xff)
    out.write(seq & 0xff)
    out.write(payload)
    out.flush()
  }

  // --------------------------------------------------------- handshake

  final case class Handshake(
      serverVersion: String, threadId: Long, scramble: Array[Byte], authPlugin: String,
      /** low 16 capability bits (enough for the CLIENT_SSL check) */
      capabilities: Long = 0L)

  val CapProtocol41 = 0x00000200L
  val CapSsl = 0x00000800L
  val CapSecureConnection = 0x00008000L
  val CapPluginAuth = 0x00080000L

  /** Initial HandshakeV10 (server → client). */
  def parseHandshake(p: Array[Byte]): Handshake = {
    val r = new ByteReader(p)
    val proto = r.u8()
    require(proto == 10, s"mysql: unsupported protocol version $proto")
    val serverVersion = r.strNul()
    val threadId = r.u32()
    val scramble1 = r.bytes(8)
    r.u8() // filler
    val capLow = r.u16()
    if (r.remaining == 0)
      return Handshake(serverVersion, threadId, scramble1, "", capLow.toLong)
    r.u8() // charset
    r.u16() // status
    r.u16() // capability high
    val authDataLen = r.u8()
    r.bytes(10) // reserved
    // part 2: max(13, len-8) bytes, last is a NUL
    val part2Len = math.max(13, authDataLen - 8) - 1
    val scramble2 = r.bytes(part2Len)
    r.u8() // trailing NUL
    val plugin = if (r.remaining > 0) r.strNul() else ""
    Handshake(serverVersion, threadId, scramble1 ++ scramble2, plugin, capLow.toLong)
  }

  /** mysql_native_password: SHA1(pwd) XOR SHA1(scramble + SHA1(SHA1(pwd))). */
  def nativePassword(password: String, scramble: Array[Byte]): Array[Byte] = {
    if (password.isEmpty) return Array.emptyByteArray
    val sha1 = java.security.MessageDigest.getInstance("SHA-1")
    val p1 = sha1.digest(password.getBytes("UTF-8"))
    sha1.reset()
    val p2 = sha1.digest(p1)
    sha1.reset()
    sha1.update(scramble)
    sha1.update(p2)
    val mix = sha1.digest()
    p1.indices.map(i => (p1(i) ^ mix(i)).toByte).toArray
  }

  /** caching_sha2_password scramble (MySQL 8's default plugin):
    * XOR(SHA256(pwd), SHA256(SHA256(SHA256(pwd)) + nonce)).
    */
  def sha256Password(password: String, nonce: Array[Byte]): Array[Byte] = {
    if (password.isEmpty) return Array.emptyByteArray
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val p1 = md.digest(password.getBytes("UTF-8"))
    md.reset()
    val p2 = md.digest(p1)
    md.reset()
    md.update(p2)
    md.update(nonce)
    val mix = md.digest()
    p1.indices.map(i => (p1(i) ^ mix(i)).toByte).toArray
  }

  /** Per-plugin auth response bytes for the handshake / auth-switch. */
  def authResponse(plugin: String, password: String, nonce: Array[Byte]): Array[Byte] =
    plugin match {
      case "caching_sha2_password" => sha256Password(password, nonce)
      case _ => nativePassword(password, nonce)
    }

  /** caching_sha2 full-auth password blob for a non-TLS connection:
    * (pwd + NUL) XOR nonce-cycled, RSA-OAEP(SHA-1)-encrypted under the
    * server's public key — the exact exchange MySQL 8 performs when the
    * fast-path cache misses on a plaintext channel.
    */
  def rsaEncryptedPassword(password: String, nonce: Array[Byte],
      publicKeyPem: String): Array[Byte] = {
    val pwd = password.getBytes("UTF-8") :+ 0.toByte
    val xored = pwd.indices.map(i => (pwd(i) ^ nonce(i % nonce.length)).toByte).toArray
    val der = java.util.Base64.getMimeDecoder.decode(
      publicKeyPem.replace("-----BEGIN PUBLIC KEY-----", "")
        .replace("-----END PUBLIC KEY-----", "").trim)
    val key = java.security.KeyFactory.getInstance("RSA")
      .generatePublic(new java.security.spec.X509EncodedKeySpec(der))
    val c = javax.crypto.Cipher.getInstance("RSA/ECB/OAEPWithSHA-1AndMGF1Padding")
    c.init(javax.crypto.Cipher.ENCRYPT_MODE, key)
    c.doFinal(xored)
  }

  /** HandshakeResponse41 (client → server). `withSsl` keeps CLIENT_SSL
    * asserted in the response that follows an SSLRequest (the server
    * checks the two flag sets agree).
    */
  def handshakeResponse(user: String, password: String, scramble: Array[Byte],
      plugin: String = "mysql_native_password",
      withSsl: Boolean = false): Array[Byte] = {
    val auth = authResponse(plugin, password, scramble)
    val caps = CapProtocol41 | CapSecureConnection | CapPluginAuth |
      (if (withSsl) CapSsl else 0L)
    new ByteWriter()
      .u32(caps)
      .u32(1L << 24) // max packet
      .u8(33) // utf8_general_ci
      .bytes(new Array[Byte](23))
      .strNul(user)
      .u8(auth.length).bytes(auth)
      .strNul(plugin)
      .result()
  }

  /** SSLRequest: the 32-byte prefix of HandshakeResponse41 (caps with
    * CLIENT_SSL, max packet, charset, 23 reserved zeros) sent BEFORE the
    * channel upgrades — MySQL's STARTTLS. The server reads it, switches
    * the socket to TLS, and expects the full HandshakeResponse (same
    * flags) as the next packet on the encrypted channel.
    */
  def sslRequest(): Array[Byte] =
    new ByteWriter()
      .u32(CapProtocol41 | CapSecureConnection | CapPluginAuth | CapSsl)
      .u32(1L << 24)
      .u8(33)
      .bytes(new Array[Byte](23))
      .result()

  // ---------------------------------------------------------- commands

  def comQuery(sql: String): Array[Byte] =
    new ByteWriter().u8(0x03).str(sql).result()

  /** COM_BINLOG_DUMP: start streaming from (file, pos). */
  def comBinlogDump(file: String, pos: Long, slaveServerId: Long): Array[Byte] =
    new ByteWriter().u8(0x12).u32(pos).u16(0).u32(slaveServerId).str(file).result()

  /** uuid string ("3e11fa47-71ca-11e1-9e33-c80aa9429562") → 16 bytes. */
  def uuidBytes(u: String): Array[Byte] = {
    val hex = u.replace("-", "")
    require(hex.length == 32, s"gtid: malformed server uuid '$u'")
    hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
  }

  def uuidString(b: Array[Byte]): String = {
    val h = b.map("%02x".format(_)).mkString
    s"${h.substring(0, 8)}-${h.substring(8, 12)}-${h.substring(12, 16)}-" +
      s"${h.substring(16, 20)}-${h.substring(20)}"
  }

  /** The GTID-set wire form (n_sids, then per sid: 16-byte uuid,
    * n_intervals, [start, end) — wire ends are EXCLUSIVE while
    * [[GtidSet]] carries inclusive ends).
    */
  def encodeGtidSet(set: GtidSet): Array[Byte] = {
    val w = new ByteWriter()
    w.u64(set.intervals.size.toLong)
    set.intervals.toSeq.sortBy(_._1).foreach { case (uuid, ivs) =>
      w.bytes(uuidBytes(uuid))
      w.u64(ivs.size.toLong)
      ivs.foreach { case (s, e) => w.u64(s); w.u64(e + 1) }
    }
    w.result()
  }

  def decodeGtidSet(b: Array[Byte]): GtidSet = {
    val r = new ByteReader(b)
    val nSids = r.u64()
    val m = (0L until nSids).map { _ =>
      val uuid = uuidString(r.bytes(16))
      val nIvs = r.u64()
      uuid -> (0L until nIvs).map(_ => (r.u64(), r.u64() - 1)).toVector
    }.toMap
    GtidSet(m)
  }

  val BinlogThroughGtid = 0x04

  /** COM_BINLOG_DUMP_GTID: stream everything NOT in `executed` — the
    * GTID-position resume the reference uses (its position values are
    * GTID sets; [[GtidSet]] is the matching algebra).
    */
  def comBinlogDumpGtid(executed: GtidSet, slaveServerId: Long,
      file: String = "", pos: Long = 4L): Array[Byte] = {
    val data = encodeGtidSet(executed)
    new ByteWriter()
      .u8(0x1e)
      .u16(BinlogThroughGtid)
      .u32(slaveServerId)
      .u32(file.getBytes("UTF-8").length.toLong).str(file)
      .u64(pos)
      .u32(data.length.toLong).bytes(data)
      .result()
  }

  final case class ServerError(errno: Int, message: String)
      extends RuntimeException(s"mysql error $errno: $message")

  /** OK (0x00) / ERR (0xff) / EOF (0xfe, len<9). */
  def checkOk(p: Array[Byte]): Unit = (p(0) & 0xff) match {
    case 0x00 | 0xfe => ()
    case 0xff =>
      val r = new ByteReader(p, 1)
      val errno = r.u16()
      if (r.remaining > 0 && (p(r.pos) & 0xff) == '#') { r.u8(); r.bytes(5) } // sqlstate
      throw ServerError(errno, r.strEof())
    case other => throw new IllegalStateException(f"mysql: unexpected response 0x$other%02x")
  }

  // ------------------------------------------------------ binlog events

  // event type ids (binlog v4)
  val QUERY_EVENT = 2
  val ROTATE_EVENT = 4
  val XID_EVENT = 16
  val FORMAT_DESCRIPTION_EVENT = 15
  val TABLE_MAP_EVENT = 19
  val GTID_EVENT = 33
  val WRITE_ROWS_V1 = 23
  val UPDATE_ROWS_V1 = 24
  val DELETE_ROWS_V1 = 25
  val WRITE_ROWS_V2 = 30
  val UPDATE_ROWS_V2 = 31
  val DELETE_ROWS_V2 = 32
  val HEARTBEAT_EVENT = 27

  final case class EventHeader(
      timestamp: Long, eventType: Int, serverId: Long,
      eventSize: Long, logPos: Long, flags: Int)

  sealed trait BinlogEvent { def header: EventHeader }
  final case class FormatDescription(header: EventHeader, binlogVersion: Int,
      serverVersion: String) extends BinlogEvent
  final case class Rotate(header: EventHeader, position: Long, nextFile: String)
      extends BinlogEvent
  final case class Query(header: EventHeader, database: String, sql: String)
      extends BinlogEvent
  final case class TableMap(header: EventHeader, tableId: Long,
      database: String, table: String,
      columnTypes: Array[Int], columnMeta: Array[Int],
      nullable: Array[Boolean]) extends BinlogEvent
  /** op ∈ insert|update|delete; update rows carry (before, after). */
  final case class Rows(header: EventHeader, op: String, tableId: Long,
      table: Option[TableMap],
      rows: Seq[(Option[IndexedSeq[Any]], IndexedSeq[Any])]) extends BinlogEvent
  final case class Xid(header: EventHeader, xid: Long) extends BinlogEvent
  /** GTID_LOG_EVENT: the transaction about to follow is (uuid, gno). */
  final case class Gtid(header: EventHeader, uuid: String, gno: Long)
      extends BinlogEvent
  final case class Unknown(header: EventHeader) extends BinlogEvent

  def parseHeader(r: ByteReader): EventHeader =
    EventHeader(r.u32(), r.u8(), r.u32(), r.u32(), r.u32(), r.u16())

  // column type ids
  private val TINY = 1; private val SHORT = 2; private val LONG = 3
  private val FLOAT = 4; private val DOUBLE = 5; private val NULLT = 6
  private val LEGACY_TIMESTAMP = 7; private val LONGLONG = 8
  private val INT24 = 9; private val DATE = 10
  private val LEGACY_TIME = 11; private val LEGACY_DATETIME = 12
  private val YEAR = 13; private val VARCHAR = 15; private val BIT = 16
  private val TIMESTAMP2 = 17; private val DATETIME2 = 18; private val TIME2 = 19
  private val JSON = 245; private val NEWDECIMAL = 246
  private val ENUM = 247; private val SET = 248; private val BLOB = 252
  private val VAR_STRING = 253; private val STRING = 254
  private val GEOMETRY = 255

  /** Parse one binlog event body (no packet 0x00 marker, no checksum).
    * `tableMaps` accumulates TABLE_MAP events so ROWS events resolve.
    */
  def parseEvent(body: Array[Byte],
      tableMaps: scala.collection.mutable.Map[Long, TableMap]): BinlogEvent = {
    val r = new ByteReader(body)
    val h = parseHeader(r)
    h.eventType match {
      case FORMAT_DESCRIPTION_EVENT =>
        val ver = r.u16()
        val serverVersion = {
          val raw = r.strN(50); val nul = raw.indexOf('\u0000')
          if (nul >= 0) raw.substring(0, nul) else raw
        }
        FormatDescription(h, ver, serverVersion)
      case ROTATE_EVENT =>
        val pos = r.u64()
        Rotate(h, pos, r.strEof())
      case QUERY_EVENT =>
        r.u32() // thread id
        r.u32() // exec time
        val dbLen = r.u8()
        r.u16() // error code
        val statusLen = r.u16()
        r.bytes(statusLen)
        val db = r.strN(dbLen); r.u8() // NUL
        Query(h, db, r.strEof())
      case XID_EVENT =>
        Xid(h, r.u64())
      case GTID_EVENT =>
        r.u8() // flags (commit yes/no)
        val uuid = uuidString(r.bytes(16))
        Gtid(h, uuid, r.u64())
      case TABLE_MAP_EVENT =>
        val tableId = r.u48()
        r.u16() // flags
        val db = r.strN(r.u8()); r.u8()
        val tbl = r.strN(r.u8()); r.u8()
        val nCols = r.lenenc().toInt
        val types = Array.fill(nCols)(r.u8())
        val metaLen = r.lenenc().toInt
        val metaEnd = r.pos + metaLen
        val meta = types.map {
          case VARCHAR | VAR_STRING => r.u16()
          case STRING => (r.u8() << 8) | r.u8() // real-type byte, length byte
          case NEWDECIMAL => (r.u8() << 8) | r.u8() // precision, scale
          case BLOB | JSON | GEOMETRY | FLOAT | DOUBLE => r.u8()
          case TIMESTAMP2 | DATETIME2 | TIME2 => r.u8() // fsp
          case BIT => r.u8() | (r.u8() << 8) // bits%8, then bits/8 (LE pair)
          case _ => 0
        }
        require(r.pos == metaEnd, s"table-map metadata length mismatch")
        val nullBytes = r.bytes((nCols + 7) / 8)
        val nullable = Array.tabulate(nCols)(i => (nullBytes(i / 8) & (1 << (i % 8))) != 0)
        val tm = TableMap(h, tableId, db, tbl, types, meta, nullable)
        tableMaps(tableId) = tm
        tm
      case t @ (WRITE_ROWS_V1 | WRITE_ROWS_V2 | UPDATE_ROWS_V1 | UPDATE_ROWS_V2 |
          DELETE_ROWS_V1 | DELETE_ROWS_V2) =>
        val tableId = r.u48()
        r.u16() // flags
        if (t >= WRITE_ROWS_V2) { val extraLen = r.u16(); r.bytes(extraLen - 2) }
        val nCols = r.lenenc().toInt
        val present1 = r.bytes((nCols + 7) / 8)
        val isUpdate = t == UPDATE_ROWS_V1 || t == UPDATE_ROWS_V2
        val present2 = if (isUpdate) r.bytes((nCols + 7) / 8) else present1
        val tm = tableMaps.get(tableId)
        val op = t match {
          case WRITE_ROWS_V1 | WRITE_ROWS_V2 => "insert"
          case UPDATE_ROWS_V1 | UPDATE_ROWS_V2 => "update"
          case _ => "delete"
        }
        val table = tm.getOrElse(
          throw new IllegalStateException(s"rows event for unmapped table id $tableId"))
        def presentCols(bm: Array[Byte]): IndexedSeq[Int] =
          (0 until nCols).filter(i => (bm(i / 8) & (1 << (i % 8))) != 0)
        def readRow(bm: Array[Byte]): IndexedSeq[Any] = {
          val cols = presentCols(bm)
          val nullBm = r.bytes((cols.size + 7) / 8)
          cols.zipWithIndex.map { case (ci, bi) =>
            if ((nullBm(bi / 8) & (1 << (bi % 8))) != 0) null
            else decodeValue(r, table.columnTypes(ci), table.columnMeta(ci))
          }
        }
        val rows = Seq.newBuilder[(Option[IndexedSeq[Any]], IndexedSeq[Any])]
        while (r.remaining > 0) {
          if (isUpdate) {
            val before = readRow(present1)
            val after = readRow(present2)
            rows += ((Some(before), after))
          } else {
            rows += ((None, readRow(present1)))
          }
        }
        Rows(h, op, tableId, tm, rows.result())
      case _ => Unknown(h)
    }
  }

  /** Big-endian read of `n` bytes (the DATETIME2/TIMESTAMP2/TIME2/
    * NEWDECIMAL family is stored big-endian, unlike the rest of the
    * little-endian protocol — memcmp-able keys were the design goal).
    */
  private def beN(r: ByteReader, n: Int): Long = {
    var v = 0L
    var i = 0
    while (i < n) { v = (v << 8) | r.u8(); i += 1 }
    v
  }

  /** Fractional-seconds part: ceil(fsp/2) BE bytes scaled to micros. */
  private def fracMicros(r: ByteReader, fsp: Int): Long = {
    val n = (fsp + 1) / 2
    if (n == 0) 0L
    else beN(r, n) * math.pow(10, 6 - 2 * n).toLong
  }

  /** Decode one non-null value. Signedness comes from the SCHEMA STORE,
    * not the wire — integers decode signed here and callers apply
    * MySqlTypes.unsignedFixup when the source column is UNSIGNED.
    */
  private def decodeValue(r: ByteReader, colType: Int, meta: Int): Any = colType match {
    case TINY => r.i8()
    case SHORT => r.i16()
    case INT24 => r.i24()
    case LONG => r.i32()
    case LONGLONG => r.u64()
    case FLOAT => java.lang.Float.intBitsToFloat(r.u32().toInt)
    case DOUBLE => java.lang.Double.longBitsToDouble(r.u64())
    case NULLT => null
    case DATE =>
      val v = r.u24()
      val (d, m, y) = (v & 31, (v >> 5) & 15, v >> 9)
      if (y == 0) null else java.time.LocalDate.of(y, m, d)
    case YEAR =>
      val v = r.u8()
      if (v == 0) 0 else v + 1900
    case DATETIME2 =>
      // 5 BE bytes: 1 sign bit | 17 bits year*13+month | 5 day |
      // 5 hour | 6 minute | 6 second, then fsp fraction
      val packed = beN(r, 5) - 0x8000000000L
      val micros = fracMicros(r, meta)
      val ym = (packed >> 22) & 0x1ffff
      val (y, mo) = ((ym / 13).toInt, (ym % 13).toInt)
      val d = ((packed >> 17) & 0x1f).toInt
      val (h, mi, s) =
        (((packed >> 12) & 0x1f).toInt, ((packed >> 6) & 0x3f).toInt, (packed & 0x3f).toInt)
      if (y == 0) null
      else java.time.LocalDateTime.of(y, mo, d, h, mi, s, (micros * 1000).toInt)
    case TIMESTAMP2 =>
      // 4 BE bytes epoch seconds, then fsp fraction; sec == 0 is the
      // '0000-00-00 00:00:00' sentinel -> null like the DATE/DATETIME
      // zero-dates (NOT epoch 1970)
      val sec = beN(r, 4)
      val micros = fracMicros(r, meta)
      if (sec == 0L && micros == 0L) null
      else java.time.Instant.ofEpochSecond(sec, micros * 1000)
    case TIME2 =>
      // 3 BE bytes offset-binary (sign | 10-bit hour | 6 min | 6 sec)
      // plus ceil(fsp/2) fraction bytes; a NEGATIVE time stores the
      // fraction complement-adjusted against the integer part (borrow),
      // and fsp 5-6 stores the whole 6 bytes as one offset quantity
      val n = (meta + 1) / 2
      val tmp: Long =
        if (n == 3) beN(r, 6) - 0x800000000000L
        else {
          var intPart = beN(r, 3) - 0x800000L
          var frac = if (n > 0) beN(r, n) else 0L
          if (intPart < 0 && frac > 0) { intPart += 1; frac -= 1L << (8 * n) }
          (intPart << 24) + frac * math.pow(10, 6 - 2 * n).toLong
        }
      val a = math.abs(tmp)
      val (v, usec) = (a >> 24, a & 0xffffff)
      val (h, mi, s) = ((v >> 12) & 0x3ff, (v >> 6) & 0x3f, v & 0x3f)
      val d = java.time.Duration.ofHours(h).plusMinutes(mi).plusSeconds(s)
        .plusNanos(usec * 1000)
      if (tmp < 0) d.negated() else d
    case NEWDECIMAL => decodeDecimal(r, precision = meta >> 8, scale = meta & 0xff)
    case VARCHAR | VAR_STRING =>
      val len = if (meta < 256) r.u8() else r.u16()
      r.strN(len)
    case STRING =>
      // meta = (real-type byte << 8) | length byte. ENUM/SET ride the
      // STRING slot with the real type in the high byte and NO length
      // prefix in the row image — the value IS the index / bitmask
      // (schema_store/utils.go:194-196 resolves the symbolic names).
      val b0 = (meta >> 8) & 0xff
      val b1 = meta & 0xff
      if (b0 == ENUM) { if (b1 == 1) r.u8() else r.u16() }
      else if (b0 == SET) {
        var v = 0L; var i = 0
        while (i < b1) { v |= (r.u8().toLong << (8 * i)); i += 1 }
        v
      } else {
        // CHAR(n) with n*charlen > 255 steals two length bits from the
        // type byte
        val maxLen =
          if (b0 == 0) b1
          else if ((b0 & 0x30) != 0x30) b1 | (((b0 & 0x30) ^ 0x30) << 4)
          else b1
        val actual = if (maxLen < 256) r.u8() else r.u16()
        r.strN(actual)
      }
    case BIT =>
      // meta (LE pair) = bits%8 | (bits/8)<<8; value is BE-packed
      val nbits = ((meta >> 8) & 0xff) * 8 + (meta & 0xff)
      beN(r, (nbits + 7) / 8)
    case LEGACY_TIMESTAMP => // pre-5.6: 4 LE bytes epoch seconds
      // 0 is the zero-date sentinel -> null, consistent with the v2 path
      val legacyTs = r.u32()
      if (legacyTs == 0L) null else java.time.Instant.ofEpochSecond(legacyTs)
    case LEGACY_DATETIME => // pre-5.6: u64 YYYYMMDDHHMMSS
      val v = r.u64()
      if (v == 0L) null
      else {
        val (d, t) = (v / 1000000L, v % 1000000L)
        java.time.LocalDateTime.of((d / 10000L).toInt, ((d / 100L) % 100L).toInt,
          (d % 100L).toInt, (t / 10000L).toInt, ((t / 100L) % 100L).toInt,
          (t % 100L).toInt)
      }
    case LEGACY_TIME => // pre-5.6: SIGNED int24 of +-HHMMSS
      // negative times ('-01:00:00'..'-838:59:59') store a negative
      // signed int24; unsigned reads would turn them into garbage
      // thousand-hour durations
      val raw = r.u24()
      val v = if ((raw & 0x800000L) != 0) raw - 0x1000000L else raw
      val a = math.abs(v)
      val dur = java.time.Duration.ofHours(a / 10000)
        .plusMinutes((a / 100) % 100).plusSeconds(a % 100)
      if (v < 0) dur.negated() else dur
    case BLOB | GEOMETRY | JSON =>
      // meta little-endian length-prefix bytes; JSON additionally decodes
      // the binary-JSON document to JSON text — the form the reference
      // emits downstream (msg.go:239 passes JSON columns as strings)
      val lenBytes = meta
      var len = 0L
      var i = 0
      while (i < lenBytes) { len |= (r.u8().toLong << (8 * i)); i += 1 }
      val payload = r.bytes(len.toInt)
      if (colType == JSON) JsonBinary.text(payload) else payload
    case other => throw new UnsupportedOperationException(
      s"binlog column type $other not supported by this decoder " +
        "(set: ints, float/double, decimal, bit, enum, set, varchar/char, " +
        "blob/geometry, json, date/datetime/timestamp/time both gens, year)")
  }

  // bytes needed for a partial group of d decimal digits (decimal.c)
  private val dig2bytes = Array(0, 1, 1, 2, 2, 3, 3, 4, 4, 4)

  /** NEWDECIMAL: digits in groups of 9, each full group 4 BE bytes,
    * leading/trailing partial groups in dig2bytes(d); sign rides the
    * first byte's MSB (XOR 0x80), negatives store the complement.
    */
  private[sources] def decodeDecimal(r: ByteReader, precision: Int, scale: Int): java.math.BigDecimal = {
    val intDigits = precision - scale
    val intFull = intDigits / 9; val intRem = intDigits % 9
    val fracFull = scale / 9; val fracRem = scale % 9
    val size = intFull * 4 + dig2bytes(intRem) + fracFull * 4 + dig2bytes(fracRem)
    val raw = r.bytes(size)
    val neg = (raw(0) & 0x80) == 0
    raw(0) = (raw(0) ^ 0x80).toByte
    if (neg) { var i = 0; while (i < raw.length) { raw(i) = (~raw(i)).toByte; i += 1 } }
    var pos = 0
    def take(nb: Int): Long = {
      var v = 0L; var i = 0
      while (i < nb) { v = (v << 8) | (raw(pos + i) & 0xff); i += 1 }
      pos += nb; v
    }
    val sb = new StringBuilder
    if (neg) sb.append('-')
    sb.append(take(dig2bytes(intRem)).toString)
    (0 until intFull).foreach(_ => sb.append("%09d".format(take(4))))
    if (scale > 0) {
      sb.append('.')
      (0 until fracFull).foreach(_ => sb.append("%09d".format(take(4))))
      if (fracRem > 0) sb.append(s"%0${fracRem}d".format(take(dig2bytes(fracRem))))
    }
    new java.math.BigDecimal(sb.toString())
  }

  // ----------------------------------------------------------- client

  /** Replication client: handshake → auth → checksum pin → dump stream.
    * One socket, blocking reads — run it on the source-tailer thread the
    * way the reference runs its syncer goroutine.
    */
  final class BinlogClient(host: String, port: Int, user: String,
      password: String, slaveServerId: Long = 1001L,
      /** STARTTLS: after the plain-text server handshake the client
        * sends SSLRequest and upgrades the channel before credentials
        * move — MySQL's native TLS shape (--ssl-mode=REQUIRED). The
        * context must trust the server's certificate. */
      tls: Option[javax.net.ssl.SSLContext] = None,
      /** socket read timeout while the connection is being ESTABLISHED
        * (handshake, auth, checksum pin) — every step there is
        * request/response, so a stalled peer must fail loudly, never
        * hang the tailer thread. */
      handshakeTimeoutMs: Int = 30000,
      /** read timeout for the dump STREAM itself. 0 (infinite) is the
        * correct default: a quiet master legitimately sends nothing
        * between events, and liveness is the heartbeat/canary's job
        * (streaming.Health), not the socket's. */
      streamReadTimeoutMs: Int = 0) extends AutoCloseable {

    private var socket: java.net.Socket = _
    private var in: InputStream = _
    private var out: OutputStream = _
    private val tableMaps = scala.collection.mutable.Map.empty[Long, TableMap]

    /** Connected server version (after connect()). */
    var serverVersion: String = ""

    def connect(): this.type = {
      socket = new java.net.Socket(host, port)
      socket.setSoTimeout(handshakeTimeoutMs)
      in = new BufferedInputStream(socket.getInputStream)
      out = new BufferedOutputStream(socket.getOutputStream)
      val (seq0, payload) = readPacket(in)
      val hs = parseHandshake(payload)
      serverVersion = hs.serverVersion
      var seq = seq0
      tls.foreach { ctx =>
        require((hs.capabilities & CapSsl) != 0,
          "mysql: TLS requested but the server did not advertise CLIENT_SSL " +
            "(ssl-mode=REQUIRED against a server without SSL configured)")
        writePacket(out, seq + 1, sslRequest())
        socket = Tls.upgradeClient(ctx, socket, host, port)
        socket.setSoTimeout(handshakeTimeoutMs)
        in = new BufferedInputStream(socket.getInputStream)
        out = new BufferedOutputStream(socket.getOutputStream)
        seq += 1 // sequence numbering continues across the upgrade
      }
      // answer whichever plugin the server advertised — native (the
      // pre-8.0 default) or caching_sha2 (the 8.0 default, fast path +
      // non-TLS RSA full auth). Anything else fails with an actionable
      // message rather than wrong-scramble garbage.
      val plugin =
        if (hs.authPlugin.isEmpty) "mysql_native_password" else hs.authPlugin
      require(plugin == "mysql_native_password" || plugin == "caching_sha2_password",
        s"binlog client supports mysql_native_password and caching_sha2_password " +
          s"auth; server advertised '$plugin' — create the replication user " +
          "with a supported plugin")
      writePacket(out, seq + 1,
        handshakeResponse(user, password, hs.scramble, plugin,
          withSsl = tls.isDefined))
      authConversation(plugin, hs.scramble)
      // real replicas announce they can handle whatever checksum the
      // master writes (passthrough assignment) — the actual algorithm
      // is then read off the FDE and the trailer validated per event
      query("SET @master_binlog_checksum = @@global.binlog_checksum")
      socket.setSoTimeout(streamReadTimeoutMs)
      this
    }

    /** Drive the post-handshake auth exchange to its OK: fast-path
      * success (0x01 0x03 then OK), full auth (0x01 0x04 → public-key
      * request → RSA blob → OK), or an AuthSwitchRequest (0xfe, new
      * plugin + new nonce → recomputed scramble). ERR throws ServerError.
      */
    private def authConversation(startPlugin: String,
        startNonce: Array[Byte]): Unit = {
      var activePlugin = startPlugin
      var nonce = startNonce
      var done = false
      var rounds = 0
      while (!done) {
        rounds += 1
        require(rounds <= 8, "mysql: auth conversation did not converge")
        val (s, reply) = readPacket(in)
        (reply(0) & 0xff) match {
          case 0x00 => done = true // OK
          case 0xff => checkOk(reply) // throws ServerError
          case 0x01 => // AuthMoreData
            if (reply.length == 2 && reply(1) == 0x03) {
              // caching_sha2 fast-auth success; the OK packet follows
              ()
            } else if (reply.length == 2 && reply(1) == 0x04) {
              if (tls.isDefined) {
                // full auth on a TLS channel: the password goes in the
                // clear (NUL-terminated) — the channel is already
                // encrypted, so MySQL skips the RSA exchange entirely
                // (the server hashes and caches it)
                writePacket(out, s + 1,
                  password.getBytes("UTF-8") :+ 0.toByte)
              } else {
                // full auth on a plaintext channel: fetch the server's
                // RSA public key, send the OAEP-encrypted XOR'd password
                writePacket(out, s + 1, Array(0x02.toByte))
                val (s2, keyPkt) = readPacket(in)
                require((keyPkt(0) & 0xff) == 0x01,
                  "mysql: expected AuthMoreData carrying the RSA public key")
                val pem = new String(keyPkt, 1, keyPkt.length - 1, "UTF-8")
                writePacket(out, s2 + 1, rsaEncryptedPassword(password, nonce, pem))
              }
            } else throw new IllegalStateException(
              s"mysql: unexpected AuthMoreData during $activePlugin auth " +
                s"(${reply.length - 1} bytes)")
          case 0xfe if reply.length >= 9 => // AuthSwitchRequest
            val r = new ByteReader(reply, 1)
            val newPlugin = r.strNul()
            require(newPlugin == "mysql_native_password" ||
                newPlugin == "caching_sha2_password",
              s"binlog client cannot switch to auth plugin '$newPlugin'")
            // remainder is the new nonce; servers NUL-terminate it
            var nn = r.bytes(r.remaining)
            if (nn.nonEmpty && nn.last == 0) nn = nn.dropRight(1)
            activePlugin = newPlugin
            nonce = nn
            writePacket(out, s + 1, authResponse(newPlugin, password, nonce))
          case 0xfe => done = true // bare EOF: pre-4.1 servers signal OK this way
          case other => throw new IllegalStateException(
            f"mysql: unexpected auth response 0x$other%02x")
        }
      }
    }

    def query(sql: String): Unit = {
      writePacket(out, 0, comQuery(sql))
      val (_, reply) = readPacket(in)
      checkOk(reply)
    }

    /** Stream events from (file, pos) until server EOF. */
    def dump(file: String, pos: Long): Iterator[BinlogEvent] = {
      writePacket(out, 0, comBinlogDump(file, pos, slaveServerId))
      eventStream()
    }

    /** Stream everything not in `executed` (GTID resume — the position
      * form the reference checkpoints).
      */
    def dumpGtid(executed: GtidSet): Iterator[BinlogEvent] = {
      writePacket(out, 0, comBinlogDumpGtid(executed, slaveServerId))
      eventStream()
    }

    private def eventStream(): Iterator[BinlogEvent] = {
      new Iterator[BinlogEvent] {
        private var nextEvent: BinlogEvent = _
        private var done = false
        /** 0 = none, 1 = CRC32 — announced by the FDE (5.6+ masters
          * append a checksum-algorithm byte; binlog_checksum=CRC32 is
          * the 5.6+ DEFAULT, so a real master's events all carry a
          * 4-byte CRC32 trailer that must be validated and stripped) */
        private var checksumAlg = 0
        private def advance(): Unit = {
          while (nextEvent == null && !done) {
            val (_, p) = readPacket(in)
            (p(0) & 0xff) match {
              case 0x00 =>
                var ev = java.util.Arrays.copyOfRange(p, 1, p.length)
                if ((ev(4) & 0xff) == FORMAT_DESCRIPTION_EVENT &&
                    serverVersion.compareTo("5.6") >= 0 && ev.length >= 24) {
                  // 5.6+ FDEs carry the alg byte at len-5 (before the
                  // FDE's own checksum, present for every algorithm)
                  val alg = ev(ev.length - 5) & 0xff
                  require(alg <= 1,
                    s"binlog: unsupported checksum algorithm $alg")
                  checksumAlg = alg
                  // the FDE always carries the 4 trailer bytes once the
                  // alg byte exists; validated below only under CRC32
                }
                def crcOk(e: Array[Byte]): Boolean = {
                  val dataLen = e.length - 4
                  val crc = new java.util.zip.CRC32
                  crc.update(e, 0, dataLen)
                  crc.getValue == ((e(dataLen) & 0xffL) |
                    ((e(dataLen + 1) & 0xffL) << 8) |
                    ((e(dataLen + 2) & 0xffL) << 16) |
                    ((e(dataLen + 3) & 0xffL) << 24))
                }
                if (checksumAlg == 1) {
                  require(crcOk(ev),
                    f"binlog: event CRC32 mismatch (type 0x${ev(4) & 0xff}%02x)")
                  ev = java.util.Arrays.copyOfRange(ev, 0, ev.length - 4)
                } else if ((ev(4) & 0xff) == ROTATE_EVENT && ev.length > 23 &&
                    crcOk(ev)) {
                  // a CRC32 master's ARTIFICIAL rotate precedes the FDE
                  // that announces the algorithm; a matching trailer
                  // (2^-32 false-positive odds against filename bytes)
                  // identifies it — otherwise 4 junk bytes would join
                  // the next-file name
                  ev = java.util.Arrays.copyOfRange(ev, 0, ev.length - 4)
                }
                if ((ev(4) & 0xff) == HEARTBEAT_EVENT) {
                  // idle keepalive from the master: not data, read on
                } else nextEvent = parseEvent(ev, tableMaps)
              case 0xfe if p.length < 9 => done = true
              case 0xff => checkOk(p) // throws ServerError
              case other => throw new IllegalStateException(
                f"binlog stream: unexpected marker 0x$other%02x")
            }
          }
        }
        def hasNext: Boolean = { advance(); nextEvent != null }
        def next(): BinlogEvent = {
          advance()
          if (nextEvent == null) throw new NoSuchElementException
          val e = nextEvent; nextEvent = null; e
        }
      }
    }

    def close(): Unit = if (socket != null) socket.close()
  }

  /** Events → the change-log envelope rows the pipeline consumes
    * (seq, op, database, table, typed values by column index) —
    * the RowsEvent→Msg conversion seat (binlog_tailer.go:280-470),
    * with the reference's skip of the `mysql` system schema. Updates stay
    * whole (before+after); the PK-update split is a downstream operator
    * (core.ChangeLog.pkUpdateSplit).
    *
    * seq = (binlog file index << 32) | logPos: logPos alone RESETS on
    * file rotation, so the file's numeric suffix (tracked from ROTATE
    * events — the master sends one at dump start and on every rotation)
    * rides the high bits to keep positions monotone across files. A
    * resumed dump replays from the configured file and the composed
    * position absorbs the overlap.
    */
  final case class ChangeRow(seq: Long, op: String, database: String,
      table: String, before: Option[IndexedSeq[Any]], values: IndexedSeq[Any])

  /** Numeric suffix of a binlog file name ("mysql-bin.000007" → 7). */
  def fileIndexOf(name: String): Long = {
    val digits = name.reverse.takeWhile(_.isDigit).reverse
    if (digits.isEmpty) 0L else digits.takeRight(9).toLong
  }

  def composedSeq(fileIndex: Long, logPos: Long): Long =
    (fileIndex << 32) | (logPos & 0xffffffffL)

  def changeRows(events: Iterator[BinlogEvent],
      initialFileIndex: Long = 0L): Iterator[ChangeRow] = {
    var fileIdx = initialFileIndex
    events.flatMap {
      case r: Rotate =>
        fileIdx = fileIndexOf(r.nextFile); Nil
      case Rows(h, op, _, Some(tm), rows) if tm.database != "mysql" =>
        val seq = composedSeq(fileIdx, h.logPos)
        rows.map { case (before, after) =>
          ChangeRow(seq, op, tm.database, tm.table, before, after)
        }
      case _ => Nil
    }
  }

  /** One enveloped change (string-rendered maps) — the single rendering
    * of the envelope shared by the batch frame and the streaming source.
    */
  final case class Envelope(seq: Long, op: String, database: String,
      table: String, data: Map[String, String], old: Map[String, String],
      pks: Map[String, String])

  def renderValue(v: Any): String = v match {
    case null => null
    case b: Array[Byte] => java.util.Base64.getEncoder.encodeToString(b)
    case other => other.toString
  }

  /** Render one change row with schema-store names/pks. Fails LOUDLY on
    * a name/width mismatch (a stale store after DDL must never silently
    * drop column values).
    */
  def envelopeOf(c: ChangeRow,
      names: (String, String) => Option[Seq[String]],
      pkOf: (String, String) => Seq[String]): Envelope = {
    def toMap(vs: IndexedSeq[Any]): Map[String, String] = {
      val ns = names(c.database, c.table).getOrElse(vs.indices.map(i => s"c$i"))
      require(ns.size == vs.size,
        s"schema store has ${ns.size} column names for " +
          s"${c.database}.${c.table} but the row image has ${vs.size} values")
      ns.zip(vs.map(renderValue)).toMap
    }
    val data = toMap(c.values)
    val old = c.before.map(toMap).getOrElse(Map.empty[String, String])
    // a PK update's identity is the OLD key (msg.go Pks semantics)
    val pkSource = if (old.nonEmpty) old else data
    val pks = pkOf(c.database, c.table)
      .flatMap(k => pkSource.get(k).map(k -> _)).toMap
    Envelope(c.seq, c.op, c.database, c.table, data, old, pks)
  }

  /** Change rows → the ENVELOPED frame the filter/router/sink surface
    * consumes (seq, op, database, table, data/old map<string,string>).
    * Column NAMES are not on the binlog wire — they come from the schema
    * store (`names`), exactly the tailer+SchemaStore pairing the
    * reference uses; positional c0..cN is the fallback when the store
    * has no entry yet.
    */
  def envelopeFrame(spark: org.apache.spark.sql.SparkSession,
      rows: Seq[ChangeRow],
      names: (String, String) => Option[Seq[String]] = (_, _) => None,
      pkOf: (String, String) => Seq[String] = (_, _) => Nil)
      : org.apache.spark.sql.DataFrame = {
    val tuples = rows.map { c =>
      val e = envelopeOf(c, names, pkOf)
      (e.seq, e.op, e.database, e.table, e.data, e.old, e.pks)
    }
    spark.createDataFrame(tuples)
      .toDF("seq", "op", "database", "table", "data", "old", "pks")
  }
}
