package graft.sources

import graft.sources.MongoWire._
import graft.sources.MongoWire.BVal._
import org.scalatest.funsuite.AnyFunSuite

/** OP_COMPRESSED (opcode 2012): the wire-compression layer a real
  * deployment negotiates via the hello's `compression` list
  * (networkMessageCompressors). Framing is pinned by hand-built bytes
  * independent of the codec under test; the negotiation + cursor
  * traffic runs end-to-end against the stub mongod serving compressed
  * replies and asserting the client's requests arrived compressed.
  */
class MongoCompressionSpec extends AnyFunSuite {

  private val doc = BVal.doc("find" -> BStr("oplog.rs"), "$db" -> BStr("local"))

  test("OP_COMPRESSED framing round-trips for every codec; noop bytes are pinned") {
    Seq("noop", "snappy", "zlib", "zstd").foreach { c =>
      val buf = new java.io.ByteArrayOutputStream()
      writeOpCompressed(buf, 7, 3, doc, c)
      val in = new java.io.ByteArrayInputStream(buf.toByteArray)
      val (id, to, body, wasCompressed) = readMsg(in)
      assert((id, to, body) == ((7, 3, doc)), s"codec $c")
      assert(wasCompressed, s"codec $c must arrive as OP_COMPRESSED")
    }
    // noop framing pinned by hand: header(16) + originalOpcode +
    // uncompressedSize + compressorId(0) + flagBits(0) + kind(0) + doc
    val buf = new java.io.ByteArrayOutputStream()
    writeOpCompressed(buf, 1, 0, doc, "noop")
    val b = buf.toByteArray
    def le32(o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    val docBytes = encodeDoc(doc)
    assert(le32(0) == b.length) // messageLength
    assert(le32(12) == OpCompressed)
    assert(le32(16) == OpMsg) // originalOpcode
    assert(le32(20) == 5 + docBytes.length) // uncompressedSize
    assert((b(24) & 0xff) == 0) // compressorId noop
    assert(b.drop(25 + 5).toSeq == docBytes.toSeq)
  }

  test("corrupt frames fail loudly: size mismatch, unknown compressor id") {
    val payload = compress("zlib", Array.fill[Byte](64)(7))
    intercept[IllegalArgumentException] { decompress(2, payload, 63) }
    intercept[IllegalArgumentException] {
      decompress(9, Array[Byte](1, 2, 3), 3)
    }
    intercept[IllegalArgumentException] {
      decompress(1, Array[Byte](1, 2, 3), 1 << 30) // implausible size
    }
  }

  test("negotiation + compressed cursor traffic end-to-end against the stub mongod") {
    val oplog = Seq(
      BVal.doc("ts" -> BTs(1700000100L, 1L), "op" -> BStr("i"),
        "ns" -> BStr("shop.orders"),
        "o" -> BVal.doc("_id" -> BInt(1), "status" -> BStr("OPEN"))),
      BVal.doc("ts" -> BTs(1700000101L, 1L), "op" -> BStr("i"),
        "ns" -> BStr("shop.orders"),
        "o" -> BVal.doc("_id" -> BInt(2), "status" -> BStr("NEW"))),
      BVal.doc("ts" -> BTs(1700000102L, 1L), "op" -> BStr("d"),
        "ns" -> BStr("shop.orders"), "o" -> BVal.doc("_id" -> BInt(1))))
    val srv = new StubMongod(oplog, batchSize = 2,
      supportedCompressors = Seq("zlib", "snappy"))
    try {
      // client prefers zstd (unsupported) then snappy (supported):
      // the first CLIENT choice the server accepts wins
      val client = new MongoClient("127.0.0.1", srv.port,
        compressors = Seq("zstd", "snappy")).connect()
      assert(client.negotiatedCompressor.contains("snappy"))
      val entries = client.tailOplog(BTs(1700000000L, 0L)).toVector
      client.close()
      assert(entries.size == 3)
      val changes = oplogChanges(entries.iterator).toVector
      assert(changes.map(_.op) == Vector("insert", "insert", "delete"))
      // find + getMore went over OP_COMPRESSED both ways; the hello
      // (handshake) stayed plain per the spec's exclusion list
      assert(srv.compressedRequests >= 2,
        s"find/getMore must ride OP_COMPRESSED (saw ${srv.compressedRequests})")
      assert(srv.compressedReplies >= 2)
    } finally srv.close()
  }

  test("no common compressor: hello agrees on nothing, traffic stays plain") {
    val oplog = Seq(BVal.doc("ts" -> BTs(1700000100L, 1L), "op" -> BStr("i"),
      "ns" -> BStr("shop.orders"), "o" -> BVal.doc("_id" -> BInt(1))))
    val srv = new StubMongod(oplog, supportedCompressors = Seq("zlib"))
    try {
      val client = new MongoClient("127.0.0.1", srv.port,
        compressors = Seq("zstd")).connect()
      assert(client.negotiatedCompressor.isEmpty)
      assert(client.tailOplog(BTs(0L, 0L)).size == 1)
      client.close()
      assert(srv.compressedRequests == 0 && srv.compressedReplies == 0)
    } finally srv.close()
  }

  test("auth commands stay uncompressed on a negotiated connection; data compresses after") {
    val oplog = Seq(BVal.doc("ts" -> BTs(1700000100L, 1L), "op" -> BStr("i"),
      "ns" -> BStr("shop.orders"), "o" -> BVal.doc("_id" -> BInt(1))))
    val srv = new StubMongod(oplog,
      auth = Some(("tailer", "s3cret", "SCRAM-SHA-256")),
      supportedCompressors = Seq("zstd"))
    try {
      val client = new MongoClient("127.0.0.1", srv.port,
        compressors = Seq("zstd")).connect()
      assert(client.negotiatedCompressor.contains("zstd"))
      client.authenticate("tailer", "s3cret")
      assert(srv.compressedRequests == 0,
        "hello/saslStart/saslContinue must not be compressed")
      assert(client.tailOplog(BTs(0L, 0L)).size == 1)
      assert(srv.compressedRequests >= 1, "the find must be compressed")
    } finally { srv.close() }
  }
}
