package graft.operators

import java.io.{BufferedInputStream, BufferedOutputStream, EOFException, InputStream, OutputStream}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets.{US_ASCII, UTF_8}

/** Hand-rolled gRPC-over-cleartext-HTTP/2 transport — the wire gravity's
  * filter-plugin session actually rides (hashicorp go-plugin launches the
  * sidecar binary and connects grpc to the address it prints,
  * pkg/filters/grpc_sidecar_filter.go:83-133). Round 6 closed the msgpb
  * *message* contract ([[MsgPb]]); this module closes the *transport*:
  * HTTP/2 framing (RFC 7540), HPACK header compression (RFC 7541 — full
  * decoder with static+dynamic tables and Huffman; encoder emits
  * literal-never-indexed raw strings, which every compliant peer accepts),
  * and the gRPC message framing + trailers contract (1-byte compressed
  * flag, 4-byte big-endian length, `grpc-status` trailer).
  *
  * Same playbook as [[graft.sources.BinlogWire]] / MongoWire / KafkaWire:
  * public specs only, blocking sockets, synchronous unary calls (the
  * filter rpc is strictly one-response-per-request,
  * pkg/filters/grpc/client.go:52-83), loud failures on anything outside
  * the contract. No TLS — go-plugin runs its sidecars on loopback
  * cleartext unless mTLS is configured, and gravity does not configure it.
  */
object GrpcWire {

  // ===================================================================
  // HPACK (RFC 7541)
  // ===================================================================

  object Hpack {

    /** Static table, RFC 7541 Appendix A (indices 1..61). */
    val Static: Vector[(String, String)] = Vector(
      ":authority" -> "", ":method" -> "GET", ":method" -> "POST",
      ":path" -> "/", ":path" -> "/index.html", ":scheme" -> "http",
      ":scheme" -> "https", ":status" -> "200", ":status" -> "204",
      ":status" -> "206", ":status" -> "304", ":status" -> "400",
      ":status" -> "404", ":status" -> "500", "accept-charset" -> "",
      "accept-encoding" -> "gzip, deflate", "accept-language" -> "",
      "accept-ranges" -> "", "accept" -> "",
      "access-control-allow-origin" -> "", "age" -> "", "allow" -> "",
      "authorization" -> "", "cache-control" -> "",
      "content-disposition" -> "", "content-encoding" -> "",
      "content-language" -> "", "content-length" -> "",
      "content-location" -> "", "content-range" -> "",
      "content-type" -> "", "cookie" -> "", "date" -> "", "etag" -> "",
      "expect" -> "", "expires" -> "", "from" -> "", "host" -> "",
      "if-match" -> "", "if-modified-since" -> "", "if-none-match" -> "",
      "if-range" -> "", "if-unmodified-since" -> "",
      "last-modified" -> "", "link" -> "", "location" -> "",
      "max-forwards" -> "", "proxy-authenticate" -> "",
      "proxy-authorization" -> "", "range" -> "", "referer" -> "",
      "refresh" -> "", "retry-after" -> "", "server" -> "",
      "set-cookie" -> "", "strict-transport-security" -> "",
      "transfer-encoding" -> "", "user-agent" -> "", "vary" -> "",
      "via" -> "", "www-authenticate" -> "")

    /** Huffman code table, RFC 7541 Appendix B: codes(i)/codeLens(i) for
      * symbol i (0..255 octets, 256 = EOS). Spec constants, not code.
      */
    private[operators] val codes: Array[Long] = Array(
      0x1ff8L, 0x7fffd8L, 0xfffffe2L, 0xfffffe3L, 0xfffffe4L, 0xfffffe5L,
      0xfffffe6L, 0xfffffe7L, 0xfffffe8L, 0xffffeaL, 0x3ffffffcL, 0xfffffe9L,
      0xfffffeaL, 0x3ffffffdL, 0xfffffebL, 0xfffffecL, 0xfffffedL, 0xfffffeeL,
      0xfffffefL, 0xffffff0L, 0xffffff1L, 0xffffff2L, 0x3ffffffeL, 0xffffff3L,
      0xffffff4L, 0xffffff5L, 0xffffff6L, 0xffffff7L, 0xffffff8L, 0xffffff9L,
      0xffffffaL, 0xffffffbL, 0x14L, 0x3f8L, 0x3f9L, 0xffaL,
      0x1ff9L, 0x15L, 0xf8L, 0x7faL, 0x3faL, 0x3fbL,
      0xf9L, 0x7fbL, 0xfaL, 0x16L, 0x17L, 0x18L,
      0x0L, 0x1L, 0x2L, 0x19L, 0x1aL, 0x1bL,
      0x1cL, 0x1dL, 0x1eL, 0x1fL, 0x5cL, 0xfbL,
      0x7ffcL, 0x20L, 0xffbL, 0x3fcL,
      0x1ffaL, 0x21L, 0x5dL, 0x5eL, 0x5fL, 0x60L,
      0x61L, 0x62L, 0x63L, 0x64L, 0x65L, 0x66L,
      0x67L, 0x68L, 0x69L, 0x6aL, 0x6bL, 0x6cL,
      0x6dL, 0x6eL, 0x6fL, 0x70L, 0x71L, 0x72L,
      0xfcL, 0x73L, 0xfdL, 0x1ffbL, 0x7fff0L, 0x1ffcL,
      0x3ffcL, 0x22L, 0x7ffdL, 0x3L, 0x23L, 0x4L,
      0x24L, 0x5L, 0x25L, 0x26L, 0x27L, 0x6L,
      0x74L, 0x75L, 0x28L, 0x29L, 0x2aL, 0x7L,
      0x2bL, 0x76L, 0x2cL, 0x8L, 0x9L, 0x2dL,
      0x77L, 0x78L, 0x79L, 0x7aL, 0x7bL, 0x7ffeL,
      0x7fcL, 0x3ffdL, 0x1ffdL, 0xffffffcL, 0xfffe6L, 0x3fffd2L,
      0xfffe7L, 0xfffe8L, 0x3fffd3L, 0x3fffd4L, 0x3fffd5L, 0x7fffd9L,
      0x3fffd6L, 0x7fffdaL, 0x7fffdbL, 0x7fffdcL, 0x7fffddL, 0x7fffdeL,
      0xffffebL, 0x7fffdfL, 0xffffecL, 0xffffedL, 0x3fffd7L, 0x7fffe0L,
      0xffffeeL, 0x7fffe1L, 0x7fffe2L, 0x7fffe3L, 0x7fffe4L, 0x1fffdcL,
      0x3fffd8L, 0x7fffe5L, 0x3fffd9L, 0x7fffe6L, 0x7fffe7L, 0xffffefL,
      0x3fffdaL, 0x1fffddL, 0xfffe9L, 0x3fffdbL, 0x3fffdcL, 0x7fffe8L,
      0x7fffe9L, 0x1fffdeL, 0x7fffeaL, 0x3fffddL, 0x3fffdeL, 0xfffff0L,
      0x1fffdfL, 0x3fffdfL, 0x7fffebL, 0x7fffecL, 0x1fffe0L, 0x1fffe1L,
      0x3fffe0L, 0x1fffe2L, 0x7fffedL, 0x3fffe1L, 0x7fffeeL, 0x7fffefL,
      0xfffeaL, 0x3fffe2L, 0x3fffe3L, 0x3fffe4L, 0x7ffff0L, 0x3fffe5L,
      0x3fffe6L, 0x7ffff1L, 0x3ffffe0L, 0x3ffffe1L, 0xfffebL, 0x7fff1L,
      0x3fffe7L, 0x7ffff2L, 0x3fffe8L, 0x1ffffecL, 0x3ffffe2L, 0x3ffffe3L,
      0x3ffffe4L, 0x7ffffdeL, 0x7ffffdfL, 0x3ffffe5L, 0xfffff1L, 0x1ffffedL,
      0x7fff2L, 0x1fffe3L, 0x3ffffe6L, 0x7ffffe0L, 0x7ffffe1L, 0x3ffffe7L,
      0x7ffffe2L, 0xfffff2L, 0x1fffe4L, 0x1fffe5L, 0x3ffffe8L, 0x3ffffe9L,
      0xffffffdL, 0x7ffffe3L, 0x7ffffe4L, 0x7ffffe5L, 0xfffecL, 0xfffff3L,
      0xfffedL, 0x1fffe6L, 0x3fffe9L, 0x1fffe7L, 0x1fffe8L, 0x7ffff3L,
      0x3fffeaL, 0x3fffebL, 0x1ffffeeL, 0x1ffffefL, 0xfffff4L, 0xfffff5L,
      0x3ffffeaL, 0x7ffff4L, 0x3ffffebL, 0x7ffffe6L, 0x3ffffecL, 0x3ffffedL,
      0x7ffffe7L, 0x7ffffe8L, 0x7ffffe9L, 0x7ffffeaL, 0x7ffffebL, 0xffffffeL,
      0x7ffffecL, 0x7ffffedL, 0x7ffffeeL, 0x7ffffefL, 0x7fffff0L, 0x3ffffeeL,
      0x3fffffffL)

    private[operators] val codeLens: Array[Int] = Array(
      13, 23, 28, 28, 28, 28, 28, 28, 28, 24, 30, 28, 28, 30, 28, 28,
      28, 28, 28, 28, 28, 28, 30, 28, 28, 28, 28, 28, 28, 28, 28, 28,
      6, 10, 10, 12, 13, 6, 8, 11, 10, 10, 8, 11, 8, 6, 6, 6,
      5, 5, 5, 6, 6, 6, 6, 6, 6, 6, 7, 8, 15, 6, 12, 10,
      13, 6, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7,
      7, 7, 7, 7, 7, 7, 7, 7, 8, 7, 8, 13, 19, 13, 14, 6,
      15, 5, 6, 5, 6, 5, 6, 6, 6, 5, 7, 7, 6, 6, 6, 5,
      6, 7, 6, 5, 5, 6, 7, 7, 7, 7, 7, 15, 11, 14, 13, 28,
      20, 22, 20, 20, 22, 22, 22, 23, 22, 23, 23, 23, 23, 23, 24, 23,
      24, 24, 22, 23, 24, 23, 23, 23, 23, 21, 22, 23, 22, 23, 23, 24,
      22, 21, 20, 22, 22, 23, 23, 21, 23, 22, 22, 24, 21, 22, 23, 23,
      21, 21, 22, 21, 23, 22, 23, 23, 20, 22, 22, 22, 23, 22, 22, 23,
      26, 26, 20, 19, 22, 23, 22, 25, 26, 26, 26, 27, 27, 26, 24, 25,
      19, 21, 26, 27, 27, 26, 27, 24, 21, 21, 26, 26, 28, 27, 27, 27,
      20, 24, 20, 21, 22, 21, 21, 23, 22, 22, 25, 25, 24, 24, 26, 23,
      26, 27, 26, 26, 27, 27, 27, 27, 27, 28, 27, 27, 27, 27, 27, 26,
      30)

    /** Decode tree: arrays indexed by node id; negative child = leaf
      * symbol encoded as -(sym+1); 0 = absent.
      */
    private val (treeZero, treeOne) = {
      val zero = scala.collection.mutable.ArrayBuffer[Int](0)
      val one = scala.collection.mutable.ArrayBuffer[Int](0)
      def newNode(): Int = { zero += 0; one += 0; zero.length - 1 }
      var sym = 0
      while (sym < 257) {
        val code = codes(sym); val len = codeLens(sym)
        var node = 0
        var bit = len - 1
        while (bit >= 0) {
          val one_? = ((code >>> bit) & 1L) != 0
          val arr = if (one_?) one else zero
          if (bit == 0) arr(node) = -(sym + 1)
          else {
            if (arr(node) == 0) arr(node) = newNode()
            node = arr(node)
          }
          bit -= 1
        }
        sym += 1
      }
      (zero.toArray, one.toArray)
    }

    /** Huffman-decode an HPACK string literal. EOS inside the stream and
      * padding other than a short all-ones EOS prefix are coding errors
      * (RFC 7541 §5.2).
      */
    def huffmanDecode(buf: Array[Byte], from: Int, until: Int): String = {
      val out = new java.io.ByteArrayOutputStream(until - from)
      var node = 0
      var depth = 0
      var allOnes = true
      var i = from
      while (i < until) {
        val b = buf(i) & 0xff
        var bit = 7
        while (bit >= 0) {
          val one_? = ((b >>> bit) & 1) != 0
          val next = if (one_?) treeOne(node) else treeZero(node)
          allOnes &&= one_?
          depth += 1
          if (next < 0) {
            val sym = -next - 1
            if (sym == 256) throw new IllegalArgumentException(
              "hpack: EOS symbol inside a Huffman string")
            out.write(sym)
            node = 0; depth = 0; allOnes = true
          } else if (next == 0) throw new IllegalArgumentException(
            "hpack: invalid Huffman code")
          else node = next
          bit -= 1
        }
        i += 1
      }
      if (depth > 7 || !allOnes) throw new IllegalArgumentException(
        "hpack: Huffman padding must be a <=7-bit EOS prefix")
      new String(out.toByteArray, UTF_8)
    }

    /** HPACK primitive-integer encode (RFC 7541 §5.1). `firstByteBits`
      * carries the representation's pattern bits above the prefix.
      */
    def writeInt(out: java.io.ByteArrayOutputStream, prefixBits: Int,
        firstByteBits: Int, value: Int): Unit = {
      val max = (1 << prefixBits) - 1
      if (value < max) out.write(firstByteBits | value)
      else {
        out.write(firstByteBits | max)
        var v = value - max
        while (v >= 128) { out.write((v & 0x7f) | 0x80); v >>>= 7 }
        out.write(v)
      }
    }

    /** Encoder: every header as "literal field without indexing — new
      * name" (pattern 0000) with raw (non-Huffman) strings. Stateless, so
      * no dynamic-table synchronization with the peer is ever needed;
      * any RFC 7541 decoder accepts it (grpc-go, grpc-java do).
      */
    def encode(headers: Seq[(String, String)]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream(256)
      headers.foreach { case (name, value) =>
        out.write(0x00)
        val nb = name.getBytes(US_ASCII)
        writeInt(out, 7, 0x00, nb.length); out.write(nb, 0, nb.length)
        val vb = value.getBytes(UTF_8)
        writeInt(out, 7, 0x00, vb.length); out.write(vb, 0, vb.length)
      }
      out.toByteArray
    }
  }

  /** Connection-scoped HPACK decoder: static + dynamic table, Huffman
    * strings, dynamic-table size updates. One instance per connection,
    * fed every header block in arrival order (HPACK state is
    * connection-wide, RFC 7541 §2.2).
    */
  final class HpackDecoder(maxTableSize: Int = 4096) {
    private val dyn = scala.collection.mutable.ArrayDeque.empty[(String, String)]
    private var dynSize = 0
    private var capacity = maxTableSize

    private def entrySize(e: (String, String)): Int =
      e._1.getBytes(US_ASCII).length + e._2.getBytes(UTF_8).length + 32

    private def evict(): Unit =
      while (dynSize > capacity && dyn.nonEmpty) dynSize -= entrySize(dyn.removeLast())

    private def lookup(idx: Int): (String, String) = {
      if (idx >= 1 && idx <= Hpack.Static.length) Hpack.Static(idx - 1)
      else if (idx > Hpack.Static.length &&
          idx <= Hpack.Static.length + dyn.length) dyn(idx - Hpack.Static.length - 1)
      else throw new IllegalArgumentException(s"hpack: index $idx out of table range")
    }

    def decode(block: Array[Byte]): Seq[(String, String)] = {
      val out = Seq.newBuilder[(String, String)]
      var i = 0
      def readInt(prefixBits: Int): Int = {
        val max = (1 << prefixBits) - 1
        var v = block(i) & max; i += 1
        if (v == max) {
          var shift = 0; var b = 0
          do {
            b = block(i) & 0xff; i += 1
            v += (b & 0x7f) << shift; shift += 7
          } while ((b & 0x80) != 0)
        }
        v
      }
      def readString(): String = {
        val huff = (block(i) & 0x80) != 0
        val len = readInt(7)
        val s = i; i += len
        if (i > block.length) throw new IllegalArgumentException(
          "hpack: string literal runs past the header block")
        if (huff) Hpack.huffmanDecode(block, s, i)
        else new String(block, s, len, UTF_8)
      }
      while (i < block.length) {
        val b = block(i) & 0xff
        if ((b & 0x80) != 0) { // indexed field
          out += lookup(readInt(7))
        } else if ((b & 0x40) != 0) { // literal, incremental indexing
          val nameIdx = readInt(6)
          val name = if (nameIdx == 0) readString() else lookup(nameIdx)._1
          val value = readString()
          val e = (name, value)
          dyn.prepend(e); dynSize += entrySize(e); evict()
          out += e
        } else if ((b & 0x20) != 0) { // dynamic table size update
          val sz = readInt(5)
          if (sz > maxTableSize) throw new IllegalArgumentException(
            s"hpack: table size update $sz exceeds advertised max $maxTableSize")
          capacity = sz; evict()
        } else { // literal without indexing / never indexed (0000/0001)
          val nameIdx = readInt(4)
          val name = if (nameIdx == 0) readString() else lookup(nameIdx)._1
          out += ((name, readString()))
        }
      }
      out.result()
    }
  }

  // ===================================================================
  // HTTP/2 framing (RFC 7540)
  // ===================================================================

  object Http2 {
    val Preface: Array[Byte] = "PRI * HTTP/2.0\r\n\r\nSM\r\n\r\n".getBytes(US_ASCII)

    val DATA = 0x0; val HEADERS = 0x1; val PRIORITY = 0x2
    val RST_STREAM = 0x3; val SETTINGS = 0x4; val PUSH_PROMISE = 0x5
    val PING = 0x6; val GOAWAY = 0x7; val WINDOW_UPDATE = 0x8
    val CONTINUATION = 0x9

    val FlagEndStream = 0x1; val FlagAck = 0x1; val FlagEndHeaders = 0x4
    val FlagPadded = 0x8; val FlagPriority = 0x20

    val DefaultWindow = 65535
    val DefaultMaxFrame = 16384

    /** Frames past this are protocol corruption for this transport (a
      * filter rpc carries one CDC row).
      */
    val MaxAcceptFrame: Int = 4 * 1024 * 1024

    final case class Frame(tpe: Int, flags: Int, streamId: Int, payload: Array[Byte]) {
      def flag(f: Int): Boolean = (flags & f) != 0
    }

    def writeFrame(out: OutputStream, tpe: Int, flags: Int, streamId: Int,
        payload: Array[Byte]): Unit = {
      val len = payload.length
      out.write((len >>> 16) & 0xff); out.write((len >>> 8) & 0xff); out.write(len & 0xff)
      out.write(tpe); out.write(flags)
      out.write((streamId >>> 24) & 0x7f); out.write((streamId >>> 16) & 0xff)
      out.write((streamId >>> 8) & 0xff); out.write(streamId & 0xff)
      out.write(payload, 0, len)
    }

    def readFully(in: InputStream, n: Int): Array[Byte] = {
      val buf = new Array[Byte](n)
      var off = 0
      while (off < n) {
        val r = in.read(buf, off, n - off)
        if (r < 0) throw new EOFException(s"h2: stream closed mid-frame ($off of $n)")
        off += r
      }
      buf
    }

    def readFrame(in: InputStream): Frame = {
      val hdr = readFully(in, 9)
      val len = ((hdr(0) & 0xff) << 16) | ((hdr(1) & 0xff) << 8) | (hdr(2) & 0xff)
      if (len > MaxAcceptFrame) throw new IllegalArgumentException(
        s"h2: frame length $len exceeds accepted max $MaxAcceptFrame")
      val tpe = hdr(3) & 0xff; val flags = hdr(4) & 0xff
      val sid = ((hdr(5) & 0x7f) << 24) | ((hdr(6) & 0xff) << 16) |
        ((hdr(7) & 0xff) << 8) | (hdr(8) & 0xff)
      Frame(tpe, flags, sid, readFully(in, len))
    }

    /** HEADERS payload minus optional pad-length and priority prelude. */
    def headersFragment(f: Frame): Array[Byte] = {
      var from = 0
      var until = f.payload.length
      if (f.flag(FlagPadded)) { val pad = f.payload(0) & 0xff; from += 1; until -= pad }
      if (f.flag(FlagPriority)) from += 5
      java.util.Arrays.copyOfRange(f.payload, from, until)
    }

    def dataContent(f: Frame): Array[Byte] =
      if (!f.flag(FlagPadded)) f.payload
      else {
        val pad = f.payload(0) & 0xff
        java.util.Arrays.copyOfRange(f.payload, 1, f.payload.length - pad)
      }

    def windowUpdate(out: OutputStream, streamId: Int, increment: Int): Unit = {
      val p = new Array[Byte](4)
      p(0) = ((increment >>> 24) & 0x7f).toByte; p(1) = ((increment >>> 16) & 0xff).toByte
      p(2) = ((increment >>> 8) & 0xff).toByte; p(3) = (increment & 0xff).toByte
      writeFrame(out, WINDOW_UPDATE, 0, streamId, p)
    }

    /** Parse a SETTINGS payload into (id, value) pairs. */
    def settings(payload: Array[Byte]): Seq[(Int, Long)] =
      (0 until payload.length / 6).map { k =>
        val o = k * 6
        val id = ((payload(o) & 0xff) << 8) | (payload(o + 1) & 0xff)
        val v = ((payload(o + 2) & 0xffL) << 24) | ((payload(o + 3) & 0xffL) << 16) |
          ((payload(o + 4) & 0xffL) << 8) | (payload(o + 5) & 0xffL)
        (id, v)
      }

    val SettingsInitialWindowSize = 0x4
    val SettingsMaxFrameSize = 0x5
  }

  // ===================================================================
  // gRPC message framing
  // ===================================================================

  /** 5-byte gRPC message prefix: compressed flag + big-endian length. */
  def grpcFrame(msg: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](5 + msg.length)
    out(1) = ((msg.length >>> 24) & 0xff).toByte
    out(2) = ((msg.length >>> 16) & 0xff).toByte
    out(3) = ((msg.length >>> 8) & 0xff).toByte
    out(4) = (msg.length & 0xff).toByte
    System.arraycopy(msg, 0, out, 5, msg.length)
    out
  }

  /** Extract the single message of a unary call from accumulated DATA. */
  def grpcDeframe(data: Array[Byte]): Array[Byte] = {
    require(data.length >= 5, s"grpc: body shorter than the message prefix (${data.length})")
    require(data(0) == 0, "grpc: compressed message received; this transport " +
      "negotiates identity only")
    val len = ((data(1) & 0xff) << 24) | ((data(2) & 0xff) << 16) |
      ((data(3) & 0xff) << 8) | (data(4) & 0xff)
    require(data.length == 5 + len,
      s"grpc: unary response must carry exactly one message (${data.length} vs ${5 + len})")
    java.util.Arrays.copyOfRange(data, 5, 5 + len)
  }

  /** Percent-decode a grpc-message trailer (the spec percent-encodes it). */
  def decodeGrpcMessage(s: String): String = {
    if (!s.contains('%')) s
    else {
      val out = new java.io.ByteArrayOutputStream(s.length)
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '%' && i + 2 < s.length) {
          out.write(Integer.parseInt(s.substring(i + 1, i + 3), 16)); i += 3
        } else { out.write(c.toInt); i += 1 }
      }
      new String(out.toByteArray, UTF_8)
    }
  }

  /** One rpc's outcome: response headers, message bytes, trailers. */
  final case class UnaryResult(headers: Seq[(String, String)],
      body: Array[Byte], trailers: Seq[(String, String)]) {
    def header(n: String): Option[String] =
      (trailers ++ headers).collectFirst { case (`n`, v) => v }
  }

  final class GrpcStatusException(val status: Int, message: String)
    extends RuntimeException(s"grpc-status $status: $message")

  // ===================================================================
  // Client
  // ===================================================================

  /** Blocking unary-call gRPC client over one cleartext HTTP/2
    * connection (prior-knowledge h2c — what grpc-go's insecure dial
    * speaks). Calls are serialized; stream ids climb 1,3,5,… Send-side
    * flow control tracks the peer's connection and stream windows;
    * receive-side windows are replenished after every DATA frame.
    */
  final class GrpcWireClient(host: String, port: Int,
      connectTimeoutMs: Int = 10000, readTimeoutMs: Int = 60000)
      extends AutoCloseable {

    private var socket: Socket = _
    private var in: BufferedInputStream = _
    private var out: BufferedOutputStream = _
    private val decoder = new HpackDecoder()
    private var nextStream = 1
    private var connSendWindow = Http2.DefaultWindow.toLong
    private var peerInitialWindow = Http2.DefaultWindow.toLong
    private var peerMaxFrame = Http2.DefaultMaxFrame

    def connect(): this.type = {
      socket = new Socket()
      socket.connect(new java.net.InetSocketAddress(host, port), connectTimeoutMs)
      socket.setSoTimeout(readTimeoutMs)
      socket.setTcpNoDelay(true)
      in = new BufferedInputStream(socket.getInputStream)
      out = new BufferedOutputStream(socket.getOutputStream)
      out.write(Http2.Preface)
      Http2.writeFrame(out, Http2.SETTINGS, 0, 0, Array.emptyByteArray)
      out.flush()
      this
    }

    private final class CallState(val sid: Int) {
      var headers: Seq[(String, String)] = Nil
      var trailers: Seq[(String, String)] = Nil
      var sawHeaders = false
      val data = new java.io.ByteArrayOutputStream(256)
      var done = false
      var streamSendWindow: Long = peerInitialWindow
      // a header block interrupted by END_HEADERS=0 accumulates here
      val fragment = new java.io.ByteArrayOutputStream(0)
      var fragmentEndStream = false
    }

    /** Process one incoming frame against the in-flight call. Frames for
      * the connection (SETTINGS/PING/WINDOW_UPDATE/GOAWAY) are handled
      * here too — this is the only read path.
      */
    private def processFrame(f: Http2.Frame, st: CallState): Unit = f.tpe match {
      case Http2.SETTINGS =>
        if (!f.flag(Http2.FlagAck)) {
          Http2.settings(f.payload).foreach {
            case (Http2.SettingsInitialWindowSize, v) =>
              val delta = v - peerInitialWindow
              peerInitialWindow = v
              st.streamSendWindow += delta
            case (Http2.SettingsMaxFrameSize, v) => peerMaxFrame = v.toInt
            case _ => ()
          }
          Http2.writeFrame(out, Http2.SETTINGS, Http2.FlagAck, 0, Array.emptyByteArray)
          out.flush()
        }
      case Http2.PING =>
        if (!f.flag(Http2.FlagAck)) {
          Http2.writeFrame(out, Http2.PING, Http2.FlagAck, 0, f.payload); out.flush()
        }
      case Http2.WINDOW_UPDATE =>
        val inc = ((f.payload(0) & 0x7f) << 24) | ((f.payload(1) & 0xff) << 16) |
          ((f.payload(2) & 0xff) << 8) | (f.payload(3) & 0xff)
        if (f.streamId == 0) connSendWindow += inc
        else if (f.streamId == st.sid) st.streamSendWindow += inc
      case Http2.GOAWAY =>
        val lastSid = ((f.payload(0) & 0x7f) << 24) | ((f.payload(1) & 0xff) << 16) |
          ((f.payload(2) & 0xff) << 8) | (f.payload(3) & 0xff)
        val err = ((f.payload(4) & 0xffL) << 24) | ((f.payload(5) & 0xffL) << 16) |
          ((f.payload(6) & 0xffL) << 8) | (f.payload(7) & 0xffL)
        if (st.sid > lastSid || err != 0) throw new java.io.IOException(
          s"h2: peer sent GOAWAY (error $err, last stream $lastSid)")
      case Http2.RST_STREAM if f.streamId == st.sid =>
        val err = ((f.payload(0) & 0xffL) << 24) | ((f.payload(1) & 0xffL) << 16) |
          ((f.payload(2) & 0xffL) << 8) | (f.payload(3) & 0xffL)
        throw new java.io.IOException(s"h2: stream ${st.sid} reset by peer (error $err)")
      case Http2.HEADERS | Http2.CONTINUATION =>
        // HPACK state is connection-wide: every block must be decoded in
        // order, whatever stream it belongs to
        val frag = if (f.tpe == Http2.HEADERS) Http2.headersFragment(f) else f.payload
        st.fragment.write(frag, 0, frag.length)
        if (f.tpe == Http2.HEADERS)
          st.fragmentEndStream = f.flag(Http2.FlagEndStream)
        if (f.flag(Http2.FlagEndHeaders)) {
          val decoded = decoder.decode(st.fragment.toByteArray)
          st.fragment.reset()
          if (f.streamId == st.sid) {
            if (!st.sawHeaders) { st.sawHeaders = true; st.headers = decoded }
            else st.trailers = decoded
            if (st.fragmentEndStream) st.done = true
          }
        }
      case Http2.DATA =>
        val content = Http2.dataContent(f)
        if (f.streamId == st.sid) st.data.write(content, 0, content.length)
        // replenish receive windows promptly so a chatty peer never stalls
        if (f.payload.length > 0) {
          Http2.windowUpdate(out, 0, f.payload.length)
          if (!f.flag(Http2.FlagEndStream))
            Http2.windowUpdate(out, f.streamId, f.payload.length)
          out.flush()
        }
        if (f.streamId == st.sid && f.flag(Http2.FlagEndStream)) st.done = true
      case _ => () // PRIORITY, PUSH_PROMISE (never requested), unknown: ignore
    }

    /** One unary rpc: request headers + one framed message, response
      * headers + one message + trailers. Throws [[GrpcStatusException]]
      * on non-zero grpc-status (including trailers-only responses).
      */
    def call(path: String, message: Array[Byte]): Array[Byte] =
      callRaw(path, message) match {
        case Right(body) => body
        case Left(e) => throw e
      }

    def callRaw(path: String, message: Array[Byte]): Either[GrpcStatusException, Array[Byte]] =
      synchronized {
        val st = new CallState(nextStream)
        nextStream += 2
        val hdrs = Hpack.encode(Seq(
          ":method" -> "POST", ":scheme" -> "http", ":path" -> path,
          ":authority" -> s"$host:$port",
          "content-type" -> "application/grpc",
          "user-agent" -> "graft-grpc-wire/0.1",
          "te" -> "trailers"))
        Http2.writeFrame(out, Http2.HEADERS, Http2.FlagEndHeaders, st.sid, hdrs)
        val framed = grpcFrame(message)
        var off = 0
        while (off < framed.length && !st.done) {
          val budget = math.min(connSendWindow, st.streamSendWindow)
          if (budget <= 0) {
            // wait for the peer to open its windows (it acks consumed
            // DATA with WINDOW_UPDATEs on this same socket)
            out.flush()
            processFrame(Http2.readFrame(in), st)
          } else {
            val n = math.min(math.min(budget, peerMaxFrame.toLong),
              (framed.length - off).toLong).toInt
            val last = off + n == framed.length
            Http2.writeFrame(out, Http2.DATA,
              if (last) Http2.FlagEndStream else 0, st.sid,
              java.util.Arrays.copyOfRange(framed, off, off + n))
            connSendWindow -= n
            st.streamSendWindow -= n
            off += n
          }
        }
        out.flush()
        while (!st.done) processFrame(Http2.readFrame(in), st)
        val res = UnaryResult(st.headers, st.data.toByteArray, st.trailers)
        val status = res.header("grpc-status").map(_.toInt).getOrElse(
          throw new java.io.IOException("grpc: response carried no grpc-status"))
        if (status != 0)
          Left(new GrpcStatusException(status,
            res.header("grpc-message").map(decodeGrpcMessage).getOrElse("")))
        else {
          val httpStatus = res.headers.collectFirst { case (":status", v) => v }
          require(httpStatus.contains("200"), s"grpc: http status $httpStatus")
          Right(grpcDeframe(res.body))
        }
      }

    def close(): Unit = if (socket != null) {
      try {
        // best-effort graceful close; the peer may already be gone
        Http2.writeFrame(out, Http2.GOAWAY, 0, 0, new Array[Byte](8))
        out.flush()
      } catch { case _: Exception => () }
      try socket.close() catch { case _: Exception => () }
    }

    /** Open a SERVER-STREAMING rpc: one request message, many response
      * messages (etcd's Watch shape). The client's send half stays OPEN
      * (etcd cancels a watch whose client half-closes), so the stream
      * owns this connection until [[GrpcServerStream.close]] — make no
      * other calls on this client while a stream is live.
      */
    def serverStream(path: String, message: Array[Byte]): GrpcServerStream =
      synchronized {
        val st = new CallState(nextStream)
        nextStream += 2
        Http2.writeFrame(out, Http2.HEADERS, Http2.FlagEndHeaders, st.sid,
          Hpack.encode(Seq(
            ":method" -> "POST", ":scheme" -> "http", ":path" -> path,
            ":authority" -> s"$host:$port",
            "content-type" -> "application/grpc",
            "user-agent" -> "graft-grpc-wire/0.1",
            "te" -> "trailers")))
        // request messages are small (a watch-create); windows suffice
        Http2.writeFrame(out, Http2.DATA, 0, st.sid, grpcFrame(message))
        out.flush()
        new GrpcServerStream(st)
      }

    final class GrpcServerStream private[GrpcWireClient] (st: CallState) {
      private var parsed = 0 // bytes of st.data already returned as messages

      /** Blocking: the next response message, or None when the server
        * closes the stream (trailers). Throws [[GrpcStatusException]] on
        * a non-zero grpc-status close.
        */
      def next(): Option[Array[Byte]] = {
        def extract(): Option[Array[Byte]] = {
          val buf = st.data.toByteArray
          if (buf.length - parsed < 5) None
          else {
            require(buf(parsed) == 0, "grpc: compressed stream message")
            val len = ((buf(parsed + 1) & 0xff) << 24) | ((buf(parsed + 2) & 0xff) << 16) |
              ((buf(parsed + 3) & 0xff) << 8) | (buf(parsed + 4) & 0xff)
            if (buf.length - parsed - 5 < len) None
            else {
              val msg = java.util.Arrays.copyOfRange(buf, parsed + 5, parsed + 5 + len)
              parsed += 5 + len
              Some(msg)
            }
          }
        }
        var m = extract()
        while (m.isEmpty && !st.done) {
          processFrame(Http2.readFrame(in), st)
          m = extract()
        }
        m match {
          case some @ Some(_) => some
          case None =>
            val status = UnaryResult(st.headers, Array.emptyByteArray, st.trailers)
              .header("grpc-status").map(_.toInt).getOrElse(
                throw new java.io.IOException("grpc: stream closed with no grpc-status"))
            if (status != 0) throw new GrpcStatusException(status,
              UnaryResult(st.headers, Array.emptyByteArray, st.trailers)
                .header("grpc-message").map(decodeGrpcMessage).getOrElse(""))
            None
        }
      }

      /** Tear the stream down (RST) — the watch-cancel shape. */
      def close(): Unit = {
        try {
          val p = new Array[Byte](4)
          p(3) = 8 // CANCEL
          Http2.writeFrame(out, Http2.RST_STREAM, 0, st.sid, p)
          out.flush()
        } catch { case _: Exception => () }
      }
    }
  }

  // ===================================================================
  // Server
  // ===================================================================

  /** Minimal unary gRPC server over h2c: enough of RFC 7540/7541 to
    * serve go-plugin's session shape — used both as the in-test stub
    * peer and as the real serving side of [[MsgPbGrpcSidecar]].
    * `handlers` maps full method paths to request→response byte
    * functions; a handler throw surfaces as grpc-status 2 (UNKNOWN), an
    * unknown path as 12 (UNIMPLEMENTED) — grpc-go's own mappings.
    */
  final class GrpcWireServer(handlers: Map[String, Array[Byte] => Array[Byte]],
      streamHandlers: Map[String, (Array[Byte], Array[Byte] => Unit) => Unit] = Map.empty)
      extends AutoCloseable {
    private val server = new ServerSocket(0, 16, InetAddress.getLoopbackAddress)
    def port: Int = server.getLocalPort

    /** Paths invoked, in order — lets a spec assert the session shape. */
    val calls = new java.util.concurrent.ConcurrentLinkedQueue[String]()

    private val acceptor = new Thread(() => {
      try while (!server.isClosed) {
        val sock = server.accept()
        val worker = new Thread(() => {
          try serve(sock) catch { case _: Exception => () }
          finally { try sock.close() catch { case _: Exception => () } }
        })
        worker.setDaemon(true)
        worker.start()
      } catch { case _: Exception => () }
    })
    acceptor.setDaemon(true)
    acceptor.start()

    private final class StreamState {
      var path = ""
      var headerFragment = new java.io.ByteArrayOutputStream(0)
      var inHeaders = false
      var headersEndStream = false
      val data = new java.io.ByteArrayOutputStream(64)
      var complete = false
      var streamDispatched = false

      /** First complete gRPC message in the buffer, if any — streaming
        * rpcs dispatch on message arrival, not stream end (the client's
        * send half stays open for the etcd Watch shape).
        */
      def firstMessage: Option[Array[Byte]] = {
        val buf = data.toByteArray
        if (buf.length < 5) None
        else {
          val len = ((buf(1) & 0xff) << 24) | ((buf(2) & 0xff) << 16) |
            ((buf(3) & 0xff) << 8) | (buf(4) & 0xff)
          if (buf.length - 5 < len) None
          else Some(java.util.Arrays.copyOfRange(buf, 5, 5 + len))
        }
      }
    }

    private def serve(sock: Socket): Unit = {
      sock.setTcpNoDelay(true)
      val in = new BufferedInputStream(sock.getInputStream)
      val out = new BufferedOutputStream(sock.getOutputStream)
      val preface = Http2.readFully(in, Http2.Preface.length)
      require(java.util.Arrays.equals(preface, Http2.Preface),
        "h2: client preface mismatch")
      Http2.writeFrame(out, Http2.SETTINGS, 0, 0, Array.emptyByteArray)
      out.flush()
      val decoder = new HpackDecoder()
      val streams = scala.collection.mutable.Map.empty[Int, StreamState]
      var connSendWindow = Http2.DefaultWindow.toLong
      var peerInitialWindow = Http2.DefaultWindow.toLong
      var peerMaxFrame = Http2.DefaultMaxFrame
      val streamSendWindows = scala.collection.mutable.Map.empty[Int, Long]

      /** Connection-plumbing frames, consumable from anywhere (the main
        * loop, or mid-response while waiting for send window). Returns
        * true if the frame was consumed here.
        */
      def handleConnFrame(f: Http2.Frame): Boolean = f.tpe match {
        case Http2.SETTINGS =>
          if (!f.flag(Http2.FlagAck)) {
            Http2.settings(f.payload).foreach {
              case (Http2.SettingsInitialWindowSize, v) => peerInitialWindow = v
              case (Http2.SettingsMaxFrameSize, v) => peerMaxFrame = v.toInt
              case _ => ()
            }
            Http2.writeFrame(out, Http2.SETTINGS, Http2.FlagAck, 0,
              Array.emptyByteArray)
            out.flush()
          }
          true
        case Http2.PING =>
          if (!f.flag(Http2.FlagAck)) {
            Http2.writeFrame(out, Http2.PING, Http2.FlagAck, 0, f.payload)
            out.flush()
          }
          true
        case Http2.WINDOW_UPDATE =>
          val inc = ((f.payload(0) & 0x7f) << 24) | ((f.payload(1) & 0xff) << 16) |
            ((f.payload(2) & 0xff) << 8) | (f.payload(3) & 0xff)
          if (f.streamId == 0) connSendWindow += inc
          else streamSendWindows(f.streamId) =
            streamSendWindows.getOrElse(f.streamId, peerInitialWindow) + inc
          true
        case _ => false
      }

      /** Server-streaming dispatch: response headers, then one DATA frame
        * per emitted message, then trailers. Emits skip send-window
        * accounting — stream responses here are stub-scale (a few KB);
        * a production watch hub would pump WINDOW_UPDATEs like the
        * unary path does.
        */
      def respondStream(sid: Int, st: StreamState,
          h: (Array[Byte], Array[Byte] => Unit) => Unit): Unit = {
        calls.add(st.path)
        st.streamDispatched = true
        val req = st.firstMessage.get
        Http2.writeFrame(out, Http2.HEADERS, Http2.FlagEndHeaders, sid,
          Hpack.encode(Seq(
            ":status" -> "200", "content-type" -> "application/grpc")))
        try {
          h(req, msg => {
            Http2.writeFrame(out, Http2.DATA, 0, sid, grpcFrame(msg))
            out.flush()
          })
          Http2.writeFrame(out, Http2.HEADERS,
            Http2.FlagEndHeaders | Http2.FlagEndStream, sid,
            Hpack.encode(Seq("grpc-status" -> "0")))
        } catch {
          case e: Exception =>
            Http2.writeFrame(out, Http2.HEADERS,
              Http2.FlagEndHeaders | Http2.FlagEndStream, sid,
              Hpack.encode(Seq("grpc-status" -> "2",
                "grpc-message" -> Option(e.getMessage).getOrElse(e.getClass.getName))))
        }
        out.flush()
      }

      def maybeDispatchStream(sid: Int, st: StreamState): Boolean =
        if (!st.streamDispatched && st.path.nonEmpty &&
            streamHandlers.contains(st.path) && st.firstMessage.isDefined) {
          respondStream(sid, st, streamHandlers(st.path))
          streams.remove(sid)
          true
        } else false

      def respond(sid: Int, st: StreamState): Unit = {
        calls.add(st.path)
        def trailersOnly(status: Int, msg: String): Unit = {
          val t = Hpack.encode(Seq(
            ":status" -> "200", "content-type" -> "application/grpc",
            "grpc-status" -> status.toString, "grpc-message" -> msg))
          Http2.writeFrame(out, Http2.HEADERS,
            Http2.FlagEndHeaders | Http2.FlagEndStream, sid, t)
          out.flush()
        }
        handlers.get(st.path) match {
          case None => trailersOnly(12, s"unknown service method ${st.path}")
          case Some(h) =>
            val rsp =
              try Right(h(grpcDeframe(st.data.toByteArray)))
              catch { case e: Exception => Left(e) }
            rsp match {
              case Left(e) =>
                trailersOnly(2, Option(e.getMessage).getOrElse(e.getClass.getName))
              case Right(body) =>
                Http2.writeFrame(out, Http2.HEADERS, Http2.FlagEndHeaders, sid,
                  Hpack.encode(Seq(
                    ":status" -> "200", "content-type" -> "application/grpc")))
                val framed = grpcFrame(body)
                var off = 0
                while (off < framed.length) {
                  var budget = math.min(connSendWindow,
                    streamSendWindows.getOrElse(sid, peerInitialWindow))
                  if (budget <= 0) {
                    // wait for the peer's WINDOW_UPDATEs; a synchronous
                    // unary peer sends nothing else mid-response, so any
                    // stream frame here is a contract breach — fail loudly
                    out.flush()
                    val f = Http2.readFrame(in)
                    require(handleConnFrame(f),
                      s"h2: unexpected frame type ${f.tpe} while awaiting send window")
                  } else {
                    budget = math.min(budget, peerMaxFrame.toLong)
                    val n = math.min(budget, (framed.length - off).toLong).toInt
                    Http2.writeFrame(out, Http2.DATA, 0, sid,
                      java.util.Arrays.copyOfRange(framed, off, off + n))
                    connSendWindow -= n
                    streamSendWindows(sid) =
                      streamSendWindows.getOrElse(sid, peerInitialWindow) - n
                    off += n
                  }
                }
                Http2.writeFrame(out, Http2.HEADERS,
                  Http2.FlagEndHeaders | Http2.FlagEndStream, sid,
                  Hpack.encode(Seq("grpc-status" -> "0")))
                out.flush()
            }
        }
      }

      while (true) {
        val f = Http2.readFrame(in)
        if (!handleConnFrame(f)) f.tpe match {
          case Http2.HEADERS | Http2.CONTINUATION =>
            val st = streams.getOrElseUpdate(f.streamId, new StreamState)
            val frag =
              if (f.tpe == Http2.HEADERS) Http2.headersFragment(f) else f.payload
            st.headerFragment.write(frag, 0, frag.length)
            if (f.tpe == Http2.HEADERS)
              st.headersEndStream = f.flag(Http2.FlagEndStream)
            if (f.flag(Http2.FlagEndHeaders)) {
              val decoded = decoder.decode(st.headerFragment.toByteArray)
              st.headerFragment.reset()
              decoded.collectFirst { case (":path", p) => p }
                .foreach(p => st.path = p)
              if (st.headersEndStream) st.complete = true
            }
            if (st.complete) { respond(f.streamId, st); streams.remove(f.streamId) }
          case Http2.DATA =>
            val st = streams.getOrElseUpdate(f.streamId, new StreamState)
            val content = Http2.dataContent(f)
            st.data.write(content, 0, content.length)
            if (f.payload.length > 0) {
              Http2.windowUpdate(out, 0, f.payload.length)
              if (!f.flag(Http2.FlagEndStream))
                Http2.windowUpdate(out, f.streamId, f.payload.length)
              out.flush()
            }
            if (!maybeDispatchStream(f.streamId, st)) {
              if (f.flag(Http2.FlagEndStream)) {
                st.complete = true
                respond(f.streamId, st)
                streams.remove(f.streamId)
              }
            }
          case Http2.RST_STREAM => streams.remove(f.streamId)
          case Http2.GOAWAY => return
          case _ => ()
        }
      }
    }

    def close(): Unit = { try server.close() catch { case _: Exception => () } }
  }
}
