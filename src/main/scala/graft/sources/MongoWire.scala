package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, InputStream, OutputStream}

/** MongoDB wire protocol (OP_MSG) + the BSON subset an oplog tail needs,
  * hand-rolled from the public specifications — the network layer the
  * reference's mongo-stream input gets from mgo/gtm
  * (pkg/inputs/mongostream/oplog_tailer.go:95-226 consumes a driver
  * session; this closes that delegated layer, completing the TidbProto /
  * MsgPb / BinlogWire set).
  *
  * Covered: OP_MSG framing (opcode 2013, kind-0 body section), a BSON
  * codec for double/string/document/array/ObjectId/bool/datetime/null/
  * int32/timestamp/int64 (unknown element types fail loudly with the
  * type id), the `hello` handshake, and the tailable find/getMore cursor
  * loop over `local.oplog.rs`. Oplog entries convert to change records
  * with the reference's delta posture (UpdateDataAsDelta: $set/$unset
  * ride through as partial images; replacement updates carry the full
  * document) — the downstream delta algebra is core.ChangeLog's.
  */
object MongoWire {

  // --------------------------------------------------------------- BSON

  sealed trait BVal
  object BVal {
    final case class BDouble(v: Double) extends BVal
    final case class BStr(v: String) extends BVal
    final case class BDoc(fields: Seq[(String, BVal)]) extends BVal {
      def get(name: String): Option[BVal] = fields.find(_._1 == name).map(_._2)
      def str(name: String): Option[String] = get(name).collect { case BStr(s) => s }
      def doc(name: String): Option[BDoc] = get(name).collect { case d: BDoc => d }
      def long(name: String): Option[Long] = get(name).collect {
        case BLong(v) => v
        case BInt(v) => v.toLong
        case BDouble(v) => v.toLong
      }
    }
    final case class BArr(items: Seq[BVal]) extends BVal
    final case class BObjId(bytes: Vector[Byte]) extends BVal
    final case class BBool(v: Boolean) extends BVal
    final case class BDate(ms: Long) extends BVal
    case object BNull extends BVal
    /** generic (subtype 0) binary — SASL payloads ride this type */
    final case class BBin(bytes: Vector[Byte]) extends BVal
    final case class BInt(v: Int) extends BVal
    /** oplog `ts`: (seconds << 32) | increment on the wire. */
    final case class BTs(seconds: Long, inc: Long) extends BVal
    final case class BLong(v: Long) extends BVal
    /** deprecated symbol (0x0e) — wire-identical to string; kept a
      * DISTINCT type so goldens pin the tag and round-trips preserve it
      * (old mongo exports still carry symbols).
      */
    final case class BSymbol(v: String) extends BVal
    /** deprecated DBPointer (0x0c): namespace string + 12-byte oid. */
    final case class BDbPointer(ns: String, oid: Vector[Byte]) extends BVal
    /** decimal128 (0x13), IEEE 754-2008 BID encoding. Decoded to
      * (negative, coefficient, exponent) with NaN/Inf flagged; the raw
      * (hi, lo) words are kept so re-encode is bit-lossless even for
      * non-canonical payloads.
      */
    final case class BDec128(negative: Boolean, coefficient: BigInt,
        exponent: Int, isNaN: Boolean, isInf: Boolean,
        rawHi: Long, rawLo: Long) extends BVal {
      def renderString: String =
        if (isNaN) "NaN"
        else if (isInf) { if (negative) "-Infinity" else "Infinity" }
        else s"${if (negative) "-" else ""}${coefficient}E$exponent"
    }

    def doc(fields: (String, BVal)*): BDoc = BDoc(fields)
  }
  import BVal._

  def encodeDoc(d: BDoc): Array[Byte] = {
    val e = new java.io.ByteArrayOutputStream(64)
    val w = new BsonElemWriter(e)
    d.fields.foreach { case (n, v) => w.el(n, v) }
    val elems = e.toByteArray
    val out = new java.io.ByteArrayOutputStream(elems.length + 5)
    val total = elems.length + 5
    out.write(total & 0xff); out.write((total >> 8) & 0xff)
    out.write((total >> 16) & 0xff); out.write((total >> 24) & 0xff)
    out.write(elems, 0, elems.length)
    out.write(0)
    out.toByteArray
  }

  /** Element writer — the single source of truth for element rendering. */
  private final class BsonElemWriter(out: java.io.ByteArrayOutputStream) {
    private def i32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    private def i64(v: Long): Unit = { i32(v.toInt); i32((v >> 32).toInt) }
    private def cstr(s: String): Unit = { out.write(s.getBytes("UTF-8")); out.write(0) }
    private def bstr(s: String): Unit = {
      val b = s.getBytes("UTF-8"); i32(b.length + 1); out.write(b); out.write(0)
    }
    def el(name: String, v: BVal): Unit = v match {
      case BDouble(x) => out.write(0x01); cstr(name); i64(java.lang.Double.doubleToLongBits(x))
      case BStr(x) => out.write(0x02); cstr(name); bstr(x)
      case d: BDoc => out.write(0x03); cstr(name); out.write(encodeDoc(d))
      case BArr(items) =>
        out.write(0x04); cstr(name)
        out.write(encodeDoc(BDoc(items.zipWithIndex.map { case (it, i) => i.toString -> it })))
      case BBin(b) => out.write(0x05); cstr(name); i32(b.length); out.write(0); out.write(b.toArray)
      case BObjId(b) => out.write(0x07); cstr(name); out.write(b.toArray)
      case BBool(x) => out.write(0x08); cstr(name); out.write(if (x) 1 else 0)
      case BDate(ms) => out.write(0x09); cstr(name); i64(ms)
      case BNull => out.write(0x0a); cstr(name)
      case BInt(x) => out.write(0x10); cstr(name); i32(x)
      case BTs(s, i) => out.write(0x11); cstr(name); i32(i.toInt); i32(s.toInt)
      case BLong(x) => out.write(0x12); cstr(name); i64(x)
      case BSymbol(x) => out.write(0x0e); cstr(name); bstr(x)
      case BDbPointer(ns, oid) =>
        // fail fast on programmatic construction: a non-12-byte oid would
        // silently emit a structurally corrupt document (decode always
        // produces exactly 12)
        require(oid.length == 12, s"DBPointer oid must be 12 bytes, got ${oid.length}")
        out.write(0x0c); cstr(name); bstr(ns); out.write(oid.toArray)
      case d: BDec128 =>
        // raw words re-emitted: bit-lossless round-trip by construction
        out.write(0x13); cstr(name); i64(d.rawLo); i64(d.rawHi)
    }
  }

  /** Decode the BID (binary integer decimal) layout of decimal128:
    * sign(1) then either exponent(14) + coefficient(113), or — when the
    * two bits after the sign are 11 — the shifted high form, whose
    * implicit '100' coefficient prefix always exceeds the 10^34-1
    * coefficient domain and therefore decodes as ZERO (the libbson /
    * driver-spec convention for non-canonical payloads; same for a
    * directly-encoded out-of-domain coefficient). Combination 11111 is
    * NaN, 11110 is ±Infinity. Exponent bias 6176.
    */
  private[sources] def decodeDec128(hi: Long, lo: Long): BVal.BDec128 = {
    val neg = (hi >>> 63) == 1L
    val comb = ((hi >>> 58) & 0x1f).toInt
    val maxCoeff = BigInt("9999999999999999999999999999999999") // 10^34 - 1
    if (comb == 0x1f) BVal.BDec128(neg, 0, 0, isNaN = true, isInf = false, hi, lo)
    else if (comb == 0x1e) BVal.BDec128(neg, 0, 0, isNaN = false, isInf = true, hi, lo)
    else if (((hi >>> 61) & 0x3) == 0x3) {
      val exp = (((hi >>> 47) & 0x3fff) - 6176).toInt
      BVal.BDec128(neg, 0, exp, isNaN = false, isInf = false, hi, lo)
    } else {
      val exp = (((hi >>> 49) & 0x3fff) - 6176).toInt
      val coeff = (BigInt(hi & 0x0001ffffffffffffL) << 64) |
        (BigInt(lo >>> 1) << 1) | BigInt(lo & 1L)
      val c = if (coeff > maxCoeff) BigInt(0) else coeff
      BVal.BDec128(neg, c, exp, isNaN = false, isInf = false, hi, lo)
    }
  }

  def decodeDoc(b: Array[Byte], start: Int = 0): BDoc = {
    var pos = start
    def u8(): Int = { val v = b(pos) & 0xff; pos += 1; v }
    def i32(): Int = u8() | (u8() << 8) | (u8() << 16) | (u8() << 24)
    def i64(): Long = (i32().toLong & 0xffffffffL) | (i32().toLong << 32)
    def cstr(): String = {
      val s = pos
      while (b(pos) != 0) pos += 1
      val r = new String(b, s, pos - s, "UTF-8"); pos += 1; r
    }
    def bstr(): String = {
      val len = i32()
      val r = new String(b, pos, len - 1, "UTF-8"); pos += len; r
    }
    val total = i32()
    val end = start + total - 1 // position of the terminating 0x00
    val fields = Seq.newBuilder[(String, BVal)]
    while (pos < end) {
      val t = u8()
      val name = cstr()
      val v: BVal = t match {
        case 0x01 => BDouble(java.lang.Double.longBitsToDouble(i64()))
        case 0x02 => BStr(bstr())
        case 0x03 =>
          val d = decodeDoc(b, pos); val len = docLen(b, pos); pos += len; d
        case 0x04 =>
          val d = decodeDoc(b, pos); val len = docLen(b, pos); pos += len
          BArr(d.fields.map(_._2))
        case 0x05 =>
          val len = i32(); val sub = u8()
          require(sub == 0, f"bson binary subtype 0x$sub%02x not supported (field '$name')")
          BBin((0 until len).map(i => b(pos + i)).toVector).tap(_ => pos += len)
        case 0x07 => BObjId((0 until 12).map(i => b(pos + i)).toVector).tap(_ => pos += 12)
        case 0x08 => BBool(u8() != 0)
        case 0x09 => BDate(i64())
        case 0x0a => BNull
        case 0x10 => BInt(i32())
        case 0x11 => val inc = i32().toLong & 0xffffffffL; val sec = i32().toLong & 0xffffffffL; BTs(sec, inc)
        case 0x12 => BLong(i64())
        case 0x0c =>
          val ns = bstr()
          BDbPointer(ns, (0 until 12).map(i => b(pos + i)).toVector).tap(_ => pos += 12)
        case 0x0e => BSymbol(bstr())
        case 0x13 => val lo = i64(); val hi = i64(); decodeDec128(hi, lo)
        case other => throw new UnsupportedOperationException(
          f"bson element type 0x$other%02x not supported (field '$name')")
      }
      fields += name -> v
    }
    BDoc(fields.result())
  }

  private def docLen(b: Array[Byte], start: Int): Int =
    (b(start) & 0xff) | ((b(start + 1) & 0xff) << 8) |
      ((b(start + 2) & 0xff) << 16) | ((b(start + 3) & 0xff) << 24)

  private implicit final class Tap[A](private val a: A) {
    def tap(f: A => Unit): A = { f(a); a }
  }

  // ------------------------------------------------------------- OP_MSG

  val OpMsg = 2013
  val OpCompressed = 2012

  /** OP_MSG with one kind-0 body section, flagBits 0. */
  def writeOpMsg(out: OutputStream, requestId: Int, responseTo: Int, body: BDoc): Unit = {
    val doc = encodeDoc(body)
    val len = 16 + 4 + 1 + doc.length
    val w = new java.io.ByteArrayOutputStream(len)
    def i32(v: Int): Unit = {
      w.write(v & 0xff); w.write((v >> 8) & 0xff)
      w.write((v >> 16) & 0xff); w.write((v >> 24) & 0xff)
    }
    i32(len); i32(requestId); i32(responseTo); i32(OpMsg)
    i32(0) // flagBits
    w.write(0) // section kind 0
    w.write(doc)
    out.write(w.toByteArray)
    out.flush()
  }

  // ------------------------------------------------- OP_COMPRESSED

  /** Wire compressor ids (OP_COMPRESSED spec). Mongo's snappy is the
    * RAW block format (unlike Kafka's framed stream), zlib is a bare
    * deflate stream with the zlib header, zstd a single frame.
    */
  def compressorId(name: String): Int = name match {
    case "noop" => 0
    case "snappy" => 1
    case "zlib" => 2
    case "zstd" => 3
    case n => throw new IllegalArgumentException(
      s"mongo: unknown compressor '$n' (noop/snappy/zlib/zstd)")
  }

  def compress(name: String, data: Array[Byte]): Array[Byte] = name match {
    case "noop" => data
    case "snappy" => org.xerial.snappy.Snappy.compress(data)
    case "zlib" =>
      val d = new java.util.zip.Deflater()
      d.setInput(data); d.finish()
      val out = new java.io.ByteArrayOutputStream(data.length / 2 + 32)
      val buf = new Array[Byte](8192)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end()
      out.toByteArray
    case "zstd" => com.github.luben.zstd.Zstd.compress(data)
    case n => throw new IllegalArgumentException(s"mongo: unknown compressor '$n'")
  }

  def decompress(id: Int, data: Array[Byte], uncompressedSize: Int): Array[Byte] = {
    require(uncompressedSize >= 0 && uncompressedSize <= 64 * 1024 * 1024,
      s"mongo: implausible uncompressed size $uncompressedSize")
    val out = id match {
      case 0 => data
      case 1 => org.xerial.snappy.Snappy.uncompress(data)
      case 2 =>
        val inf = new java.util.zip.Inflater()
        inf.setInput(data)
        val res = new Array[Byte](uncompressedSize)
        var off = 0
        try {
          while (off < uncompressedSize && !inf.finished()) {
            val n = inf.inflate(res, off, uncompressedSize - off)
            require(n > 0 || inf.finished(), "mongo: zlib stream stalled")
            off += n
          }
          require(off == uncompressedSize, "mongo: zlib stream short")
          // a stream holding MORE than the declared size is equally
          // corrupt — inflating it would silently truncate the message
          if (!inf.finished()) {
            val probe = new Array[Byte](1)
            require(inf.inflate(probe) == 0 && inf.finished(),
              "mongo: zlib stream does not match the declared size")
          }
        } finally inf.end()
        res
      case 3 => com.github.luben.zstd.Zstd.decompress(data, uncompressedSize)
      case other => throw new IllegalArgumentException(
        s"mongo: unknown compressor id $other")
    }
    require(out.length == uncompressedSize,
      s"mongo: decompressed ${out.length} bytes, header said $uncompressedSize")
    out
  }

  /** OP_COMPRESSED wrapping one OP_MSG: header, original opcode,
    * uncompressed size, compressor id, then the compressed OP_MSG body
    * (everything after ITS 16-byte header: flagBits + sections).
    */
  def writeOpCompressed(out: OutputStream, requestId: Int, responseTo: Int,
      body: BDoc, compressor: String): Unit = {
    val doc = encodeDoc(body)
    val inner = new java.io.ByteArrayOutputStream(5 + doc.length)
    inner.write(0); inner.write(0); inner.write(0); inner.write(0) // flagBits
    inner.write(0) // section kind 0
    inner.write(doc)
    val uncompressed = inner.toByteArray
    val packed = compress(compressor, uncompressed)
    val len = 16 + 4 + 4 + 1 + packed.length
    val w = new java.io.ByteArrayOutputStream(len)
    def i32(v: Int): Unit = {
      w.write(v & 0xff); w.write((v >> 8) & 0xff)
      w.write((v >> 16) & 0xff); w.write((v >> 24) & 0xff)
    }
    i32(len); i32(requestId); i32(responseTo); i32(OpCompressed)
    i32(OpMsg) // original opcode
    i32(uncompressed.length)
    w.write(compressorId(compressor))
    w.write(packed)
    out.write(w.toByteArray)
    out.flush()
  }

  /** Read one OP_MSG; returns (requestId, responseTo, body). */
  def readOpMsg(in: InputStream): (Int, Int, BDoc) = {
    val (id, to, body, _) = readMsg(in)
    (id, to, body)
  }

  /** Read one OP_MSG or OP_COMPRESSED-wrapped OP_MSG; the fourth element
    * reports whether the message arrived compressed (a server asserting
    * its peer really negotiated needs to see the opcode).
    */
  def readMsg(in: InputStream): (Int, Int, BDoc, Boolean) = {
    def b(): Int = {
      val v = in.read()
      if (v < 0) throw new java.io.EOFException("mongo: connection closed")
      v
    }
    def i32(): Int = b() | (b() << 8) | (b() << 16) | (b() << 24)
    val len = i32()
    // bound BEFORE allocating: a negative or hostile length prefix must
    // fail loudly, not throw NegativeArraySizeException or attempt a
    // 2 GB buffer (48 MB is mongod's maxMessageSizeBytes)
    require(len >= 16 && len <= 48 * 1024 * 1024,
      s"mongo: implausible message length $len")
    val requestId = i32()
    val responseTo = i32()
    val opCode = i32()
    require(opCode == OpMsg || opCode == OpCompressed,
      s"mongo: unsupported opcode $opCode (only OP_MSG / OP_COMPRESSED)")
    var rest = new Array[Byte](len - 16)
    var off = 0
    while (off < rest.length) {
      val n = in.read(rest, off, rest.length - off)
      if (n < 0) throw new java.io.EOFException("mongo: truncated message")
      off += n
    }
    if (opCode == OpCompressed) {
      // originalOpcode(i32) + uncompressedSize(i32) + compressorId(u8)
      def le32(o: Int): Int = (rest(o) & 0xff) | ((rest(o + 1) & 0xff) << 8) |
        ((rest(o + 2) & 0xff) << 16) | ((rest(o + 3) & 0xff) << 24)
      val original = le32(0)
      require(original == OpMsg,
        s"mongo: OP_COMPRESSED wraps opcode $original (only OP_MSG)")
      rest = decompress(rest(8) & 0xff,
        java.util.Arrays.copyOfRange(rest, 9, rest.length), le32(4))
    }
    // flagBits(4) + kind byte; checksum absent with flagBits 0
    val kind = rest(4) & 0xff
    require(kind == 0, s"mongo: unsupported section kind $kind")
    (requestId, responseTo, decodeDoc(rest, 5), opCode == OpCompressed)
  }

  // -------------------------------------------------------------- SCRAM

  /** SCRAM-SHA-1 (RFC 5802) / SCRAM-SHA-256 (RFC 7677) primitives, with
    * MongoDB's two quirks: SHA-1 salts the hex(MD5("user:mongo:pwd"))
    * digest rather than the raw password, and the SASL conversation
    * rides saslStart/saslContinue command payloads.
    */
  object Scram {
    private def hashName(mech: String): (String, String, String, Int) = mech match {
      case "SCRAM-SHA-256" => ("SHA-256", "HmacSHA256", "PBKDF2WithHmacSHA256", 32)
      case "SCRAM-SHA-1" => ("SHA-1", "HmacSHA1", "PBKDF2WithHmacSHA1", 20)
      case m => throw new IllegalArgumentException(s"mongo: unsupported SASL mechanism '$m'")
    }

    def h(mech: String, data: Array[Byte]): Array[Byte] =
      java.security.MessageDigest.getInstance(hashName(mech)._1).digest(data)

    def hmac(mech: String, key: Array[Byte], data: Array[Byte]): Array[Byte] = {
      val m = javax.crypto.Mac.getInstance(hashName(mech)._2)
      m.init(new javax.crypto.spec.SecretKeySpec(key, hashName(mech)._2))
      m.doFinal(data)
    }

    /** The password SCRAM actually salts: SHA-256 uses the plain
      * password; SHA-1 uses hex(MD5(user + ":mongo:" + password)) —
      * MONGODB-CR's legacy digest, kept by mongod for SCRAM-SHA-1.
      */
    def mongoPassword(mech: String, user: String, password: String): String =
      if (mech == "SCRAM-SHA-1") {
        val md5 = java.security.MessageDigest.getInstance("MD5")
          .digest(s"$user:mongo:$password".getBytes("UTF-8"))
        md5.map("%02x".format(_)).mkString
      } else password

    /** RFC 5802 Hi(): PBKDF2 over the effective password — callers
      * apply any scheme-specific pre-hash first (Mongo's MD5 digest for
      * SHA-1; Kafka salts the raw password for both mechanisms).
      */
    def saltedPasswordOf(mech: String, effectivePassword: String,
        salt: Array[Byte], iterations: Int): Array[Byte] = {
      val (_, _, kdf, keyLen) = hashName(mech)
      val spec = new javax.crypto.spec.PBEKeySpec(
        effectivePassword.toCharArray, salt, iterations, keyLen * 8)
      javax.crypto.SecretKeyFactory.getInstance(kdf).generateSecret(spec).getEncoded
    }

    def saltedPassword(mech: String, user: String, password: String,
        salt: Array[Byte], iterations: Int): Array[Byte] =
      saltedPasswordOf(mech, mongoPassword(mech, user, password), salt, iterations)

    def clientKey(mech: String, salted: Array[Byte]): Array[Byte] =
      hmac(mech, salted, "Client Key".getBytes("UTF-8"))

    def storedKey(mech: String, cKey: Array[Byte]): Array[Byte] = h(mech, cKey)

    def clientProof(mech: String, salted: Array[Byte], authMessage: String): Array[Byte] = {
      val ck = clientKey(mech, salted)
      val sig = hmac(mech, storedKey(mech, ck), authMessage.getBytes("UTF-8"))
      ck.indices.map(i => (ck(i) ^ sig(i)).toByte).toArray
    }

    def serverSignature(mech: String, salted: Array[Byte], authMessage: String): Array[Byte] =
      hmac(mech, hmac(mech, salted, "Server Key".getBytes("UTF-8")),
        authMessage.getBytes("UTF-8"))

    /** RFC 5802 attribute escaping for the username ("," and "="). */
    def saslName(user: String): String =
      user.replace("=", "=3D").replace(",", "=2C")

    /** `r=...,s=...,i=...` → attribute map. */
    def attrs(msg: String): Map[String, String] =
      msg.split(",").filter(_.length >= 2).map(a => a.substring(0, 1) -> a.substring(2)).toMap
  }

  // ------------------------------------------------------------- client

  object MongoClient {
    /** commands the OP_COMPRESSED spec forbids compressing (handshake
      * + credential exchange) */
    val Uncompressible: Set[String] = Set("hello", "isMaster", "ismaster",
      "saslStart", "saslContinue", "getnonce", "authenticate",
      "createUser", "updateUser", "copydbsaslstart", "copydbgetnonce", "copydb")
  }

  final class MongoClient(host: String, port: Int,
      /** TLS from byte zero (mongod tlsMode=requireTLS) — the context
        * must trust the server's certificate; hostname is verified */
      tls: Option[javax.net.ssl.SSLContext] = None,
      /** compressors to OFFER in the hello, preference order (the
        * networkMessageCompressors client option); the first one the
        * server echoes back is used for OP_COMPRESSED traffic both
        * ways. Empty = no compression (the driver default). */
      compressors: Seq[String] = Nil,
      /** socket read timeout — every operation is request/response
        * (oplog tailing bounds its getMore server-side), so a silent
        * peer is a fault, not a quiet stream: fail loudly instead of
        * hanging the tailer thread forever. */
      readTimeoutMs: Int = 30000) extends AutoCloseable {
    private var socket: java.net.Socket = _
    private var in: InputStream = _
    private var out: OutputStream = _
    private var nextId = 1

    var serverMaxWireVersion: Long = -1L
    /** the compressor agreed in the hello (None until negotiated) */
    var negotiatedCompressor: Option[String] = None

    def connect(): this.type = {
      socket = tls match {
        case Some(ctx) => Tls.clientSocket(ctx, host, port)
        case None => new java.net.Socket(host, port)
      }
      socket.setSoTimeout(readTimeoutMs)
      in = new BufferedInputStream(socket.getInputStream)
      out = new BufferedOutputStream(socket.getOutputStream)
      compressors.foreach(c => compressorId(c)) // validate names up front
      val hello =
        if (compressors.isEmpty) BVal.doc("hello" -> BInt(1))
        else BVal.doc("hello" -> BInt(1),
          "compression" -> BArr(compressors.map(BStr(_))))
      val reply = runCommand("admin", hello)
      serverMaxWireVersion = reply.long("maxWireVersion").getOrElse(-1L)
      // the server echoes the subset it accepts, in ITS order; the spec
      // says use the first of the CLIENT's list the server accepted
      val serverAccepts = reply.get("compression").collect {
        case BArr(items) => items.collect { case BStr(s) => s }.toSet
      }.getOrElse(Set.empty[String])
      negotiatedCompressor = compressors.find(serverAccepts)
      this
    }

    /** SCRAM auth conversation (saslStart → saslContinue*): sends the
      * client proof, and REFUSES the session unless the server's
      * signature verifies — mutual authentication, not just a password
      * check. `nonce` is injectable for deterministic tests.
      */
    def authenticate(user: String, password: String,
        mechanism: String = "SCRAM-SHA-256", authDb: String = "admin",
        nonce: String = null): this.type = {
      import Scram._
      val cnonce = if (nonce != null) nonce else {
        val b = new Array[Byte](18)
        new java.security.SecureRandom().nextBytes(b)
        java.util.Base64.getEncoder.encodeToString(b)
      }
      val clientFirstBare = s"n=${saslName(user)},r=$cnonce"
      val start = runCommand(authDb, BVal.doc(
        "saslStart" -> BInt(1),
        "mechanism" -> BStr(mechanism),
        "payload" -> BBin(s"n,,$clientFirstBare".getBytes("UTF-8").toVector),
        "options" -> BVal.doc("skipEmptyExchange" -> BBool(true))))
      val convId = start.get("conversationId").getOrElse(BInt(1))
      val serverFirst = new String(start.get("payload").collect {
        case BBin(b) => b.toArray }.getOrElse(
        sys.error("mongo: saslStart reply without payload")), "UTF-8")
      val sf = attrs(serverFirst)
      val snonce = sf.getOrElse("r", sys.error("mongo: server-first missing r="))
      require(snonce.startsWith(cnonce),
        "mongo: server nonce does not extend the client nonce (MITM?)")
      val salt = java.util.Base64.getDecoder.decode(
        sf.getOrElse("s", sys.error("mongo: server-first missing s=")))
      val iters = sf.getOrElse("i", sys.error("mongo: server-first missing i=")).toInt
      require(iters >= 4096, s"mongo: iteration count $iters below the RFC floor")
      val salted = saltedPassword(mechanism, user, password, salt, iters)
      val withoutProof = s"c=biws,r=$snonce"
      val authMessage = s"$clientFirstBare,$serverFirst,$withoutProof"
      val proof = java.util.Base64.getEncoder.encodeToString(
        clientProof(mechanism, salted, authMessage))
      var reply = runCommand(authDb, BVal.doc(
        "saslContinue" -> BInt(1),
        "conversationId" -> convId,
        "payload" -> BBin(s"$withoutProof,p=$proof".getBytes("UTF-8").toVector)))
      var verified = false
      var rounds = 0
      while (!verified || !reply.get("done").contains(BBool(true))) {
        val payload = new String(reply.get("payload").collect {
          case BBin(b) => b.toArray }.getOrElse(Array.emptyByteArray), "UTF-8")
        attrs(payload).get("v").foreach { v =>
          require(java.util.Arrays.equals(
              java.util.Base64.getDecoder.decode(v),
              serverSignature(mechanism, salted, authMessage)),
            "mongo: SERVER signature mismatch — refusing the session")
          verified = true
        }
        if (!reply.get("done").contains(BBool(true))) {
          rounds += 1
          require(rounds <= 3, "mongo: SASL conversation did not converge")
          reply = runCommand(authDb, BVal.doc(
            "saslContinue" -> BInt(1),
            "conversationId" -> convId,
            "payload" -> BBin(Vector.empty)))
        } else require(verified,
          "mongo: server finished SASL without proving its signature")
      }
      this
    }

    def runCommand(db: String, cmd: BDoc): BDoc = {
      val id = nextId; nextId += 1
      val doc = BDoc(cmd.fields :+ ("$db" -> BStr(db)))
      val cmdName = cmd.fields.headOption.map(_._1).getOrElse("")
      // the OP_COMPRESSED spec excludes the handshake and auth commands
      // from compression (credentials negotiate the channel, they don't
      // ride it); everything else uses the negotiated compressor
      negotiatedCompressor match {
        case Some(c) if !MongoClient.Uncompressible(cmdName) =>
          writeOpCompressed(out, id, 0, doc, c)
        case _ => writeOpMsg(out, id, 0, doc)
      }
      val (_, to, reply) = readOpMsg(in)
      // correlation: a reply to some OTHER request must not be consumed
      // as this command's answer (out-of-sync framing otherwise goes
      // silently re-aligned one reply late)
      require(to == id, s"mongo: responseTo $to for request $id")
      reply.get("ok") match {
        case Some(BDouble(1.0)) | Some(BInt(1)) | Some(BLong(1L)) => reply
        case _ => throw new RuntimeException(
          s"mongo command failed: ${reply.str("errmsg").getOrElse(reply.toString)}")
      }
    }

    /** Tail `local.oplog.rs` from `afterTs` (exclusive) — the find +
      * getMore cursor loop (gtm's After option). Ends when the cursor id
      * goes 0 (a capped non-awaitData stub drains; a real deployment
      * keeps the cursor alive).
      */
    def tailOplog(afterTs: BTs): Iterator[BDoc] = {
      // tailable + awaitData: an up-to-date cursor BLOCKS server-side
      // (bounded by getMore maxTimeMS) instead of busy-spinning empty
      // getMore round-trips against a live primary
      val first = runCommand("local", BVal.doc(
        "find" -> BStr("oplog.rs"),
        "filter" -> BVal.doc("ts" -> BVal.doc("$gt" -> afterTs)),
        "tailable" -> BBool(true),
        "awaitData" -> BBool(true),
        "oplogReplay" -> BBool(true)))
      new Iterator[BDoc] {
        private var cursor = first.doc("cursor").getOrElse(
          sys.error("mongo: find reply without cursor"))
        private var cursorId = cursor.long("id").getOrElse(0L)
        private var batch: Seq[BDoc] =
          cursor.get("firstBatch").collect { case BArr(items) =>
            items.collect { case d: BDoc => d } }.getOrElse(Nil)
        private def refill(): Unit =
          while (batch.isEmpty && cursorId != 0L) {
            val more = runCommand("local", BVal.doc(
              "getMore" -> BLong(cursorId),
              "collection" -> BStr("oplog.rs"),
              "maxTimeMS" -> BInt(1000)))
            cursor = more.doc("cursor").getOrElse(sys.error("mongo: getMore without cursor"))
            cursorId = cursor.long("id").getOrElse(0L)
            batch = cursor.get("nextBatch").collect { case BArr(items) =>
              items.collect { case d: BDoc => d } }.getOrElse(Nil)
          }
        def hasNext: Boolean = { refill(); batch.nonEmpty }
        def next(): BDoc = {
          refill()
          val h = batch.head; batch = batch.tail; h
        }
      }
    }

    def close(): Unit = if (socket != null) socket.close()
  }

  // ------------------------------------------- oplog → change records

  /** One oplog entry as a change record: insert carries the full doc,
    * delta update carries $set/$unset partial images (UpdateDataAsDelta
    * — oplog_tailer.go:138), replacement update carries the full new
    * doc, delete carries the id. seq = (ts.seconds << 32) | ts.inc, the
    * oplog's own total order.
    */
  final case class OplogChange(seq: Long, op: String, database: String,
      collection: String, id: String, data: Map[String, String],
      unsetKeys: Seq[String])

  private def render(v: BVal): String = v match {
    case BStr(s) => s
    case BInt(i) => i.toString
    case BLong(l) => l.toString
    case BDouble(d) => d.toString
    case BBool(b) => b.toString
    case BDate(ms) => java.time.Instant.ofEpochMilli(ms).toString
    case BObjId(b) => b.map("%02x".format(_)).mkString
    case BNull => null
    case BTs(s, i) => s"$s.$i"
    case BSymbol(s) => s // symbols flow like strings (reference decodes them as values)
    case BDbPointer(ns, oid) => s"$ns:${oid.map("%02x".format(_)).mkString}"
    case d: BDec128 => d.renderString
    case d: BDoc => d.fields.map { case (k, x) => s"$k=${render(x)}" }.mkString("{", ",", "}")
    case BArr(items) => items.map(render).mkString("[", ",", "]")
  }

  def oplogChanges(entries: Iterator[BDoc]): Iterator[OplogChange] =
    entries.flatMap { e =>
      val ts = e.get("ts").collect { case t: BTs => t }.getOrElse(BTs(0, 0))
      val seq = (ts.seconds << 32) | ts.inc
      val ns = e.str("ns").getOrElse("")
      val (db, coll) = ns.span(_ != '.') match { case (d, c) => (d, c.drop(1)) }
      val o = e.doc("o").getOrElse(BVal.doc())
      def idOf(d: BDoc): String = d.get("_id").map(render).getOrElse("")
      e.str("op") match {
        case Some("i") =>
          Some(OplogChange(seq, "insert", db, coll, idOf(o),
            o.fields.map { case (k, v) => k -> render(v) }.toMap, Nil))
        case Some("d") =>
          Some(OplogChange(seq, "delete", db, coll, idOf(o), Map.empty, Nil))
        case Some("u") =>
          val id = e.doc("o2").map(idOf).getOrElse("")
          val set = o.doc("$set")
          val unset = o.doc("$unset")
          if (set.isEmpty && unset.isEmpty)
            // replacement update: full new image
            Some(OplogChange(seq, "update", db, coll, id,
              o.fields.map { case (k, v) => k -> render(v) }.toMap, Nil))
          else
            Some(OplogChange(seq, "update", db, coll, id,
              set.map(_.fields.map { case (k, v) => k -> render(v) }.toMap)
                .getOrElse(Map.empty),
              unset.map(_.fields.map(_._1)).getOrElse(Nil)))
        case _ => None // noop ("n"), commands ("c") — not row changes
      }
    }
}
