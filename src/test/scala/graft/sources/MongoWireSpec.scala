package graft.sources

import graft.sources.MongoWire._
import graft.sources.MongoWire.BVal._
import org.scalatest.funsuite.AnyFunSuite

class MongoWireSpec extends AnyFunSuite {

  private def unhex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  // hand-derived (struct-packed independently of the Scala codec):
  // {ts: Timestamp(1700000100, 2), op: "i", ns: "shop.orders",
  //  o: {_id: 7, status: "OPEN", total: 12.5}}
  private val goldenOplogInsert =
    "60000000117473000200000064f15365026f7000020000006900026e73000c000000" +
    "73686f702e6f726465727300036f002e000000105f696400070000000273746174757300" +
    "050000004f50454e0001746f74616c0000000000000029400000"

  private val goldenDoc = BVal.doc(
    "ts" -> BTs(1700000100L, 2L),
    "op" -> BStr("i"),
    "ns" -> BStr("shop.orders"),
    "o" -> BVal.doc(
      "_id" -> BInt(7), "status" -> BStr("OPEN"), "total" -> BDouble(12.5)))

  test("golden BSON bytes decode to the oplog entry; encode is byte-identical") {
    assert(decodeDoc(unhex(goldenOplogInsert)) == goldenDoc)
    assert(encodeDoc(goldenDoc).map("%02x".format(_)).mkString == goldenOplogInsert)
  }

  test("BSON round-trips the full supported type set; unknown types fail loudly") {
    val all = BVal.doc(
      "d" -> BDouble(-2.25), "s" -> BStr("héllo"), "sub" -> BVal.doc("x" -> BInt(1)),
      "arr" -> BArr(Seq(BInt(1), BStr("two"), BNull)),
      "oid" -> BObjId((1 to 12).map(_.toByte).toVector),
      "b" -> BBool(true), "dt" -> BDate(123456789L), "n" -> BNull,
      "i" -> BInt(Int.MinValue), "t" -> BTs(0xffffffffL, 1L), "l" -> BLong(Long.MinValue),
      "bin" -> BBin((1 to 5).map(_.toByte).toVector))
    assert(decodeDoc(encodeDoc(all)) == all)
    // binary subtypes beyond generic (0x00) are outside the subset —
    // 0x04 is the UUID subtype
    val badSub = unhex("120000000562000500000004010203040500")
    val e = intercept[IllegalArgumentException](decodeDoc(badSub))
    assert(e.getMessage.contains("0x04"))
    // element type 0x0b (regex) stays unsupported
    val bad = unhex("0c0000000b62002e2a000000")
    val e2 = intercept[UnsupportedOperationException](decodeDoc(bad))
    assert(e2.getMessage.contains("0x0b"))
  }

  test("exotic BSON tags decode from golden bytes: symbol, DBPointer, decimal128") {
    // hand-derived (python struct-packed, independent of the Scala codec):
    // {sym: Symbol("legacy"), ptr: DBPointer("db.coll", 000102..0b),
    //  d1: Decimal128(1.5), dneg: Decimal128(-0.5), dnan: NaN,
    //  dinf: -Infinity, dhi: non-canonical high form (coeff -> 0),
    //  dbig: out-of-domain 113-bit coefficient (coeff -> 0)}
    val golden =
      "b30000000e73796d00070000006c6567616379000c707472000800000064622e636f" +
      "6c6c00000102030405060708090a0b136431000f000000000000000000000000003e" +
      "3013646e65670005000000000000000000000000003eb013646e616e000000000000" +
      "000000000000000000007c1364696e6600000000000000000000000000000000f813" +
      "646869000700000000000000000000000000106c136462696700ffffffffffffffff" +
      "ffffffffffff413000"
    val d = decodeDoc(unhex(golden))
    assert(d.get("sym").contains(BSymbol("legacy")))
    assert(d.get("ptr").contains(
      BDbPointer("db.coll", (0 until 12).map(_.toByte).toVector)))
    def dec(n: String): BDec128 = d.get(n).collect { case x: BDec128 => x }.get
    // 1.5 = 15 x 10^-1; -0.5 = 5 x 10^-1 with the sign bit
    assert(dec("d1") == BDec128(negative = false, BigInt(15), -1,
      isNaN = false, isInf = false, 6175L << 49, 15L))
    assert(dec("dneg").negative && dec("dneg").coefficient == BigInt(5) &&
      dec("dneg").exponent == -1)
    assert(dec("d1").renderString == "15E-1" && dec("dneg").renderString == "-5E-1")
    assert(dec("dnan").isNaN && dec("dnan").renderString == "NaN")
    assert(dec("dinf").isInf && dec("dinf").negative &&
      dec("dinf").renderString == "-Infinity")
    // the two non-canonical shapes both decode coefficient 0 (driver-spec
    // convention), with the high form reading its SHIFTED exponent field
    assert(dec("dhi").coefficient == BigInt(0) && dec("dhi").exponent == 0 &&
      !dec("dhi").isNaN && !dec("dhi").isInf)
    assert(dec("dbig").coefficient == BigInt(0) && dec("dbig").exponent == 0)
    // re-encode is byte-identical (decimal128 re-emits its raw words, so
    // even the non-canonical payloads round-trip losslessly)
    assert(encodeDoc(d).map("%02x".format(_)).mkString == golden)
  }

  test("encoding a malformed DBPointer oid fails fast, not corrupt bytes") {
    // decode always yields 12 bytes; only programmatic construction can
    // produce another length — the encoder must reject it rather than emit
    // a structurally corrupt document
    val bad = BVal.doc("p" -> BDbPointer("db.coll", Vector[Byte](1, 2, 3)))
    val e = intercept[IllegalArgumentException](encodeDoc(bad))
    assert(e.getMessage.contains("12 bytes"))
  }

  test("decimal128 coefficient spans both words; domain edge is exact") {
    // 10^34 - 1 (max canonical coefficient) needs 113 bits: hi word bits
    // carry the top of the coefficient
    val maxC = BigInt("9999999999999999999999999999999999")
    val hi = (6176L << 49) | (maxC >> 64).toLong
    val lo = (maxC & BigInt("ffffffffffffffff", 16)).toLong
    val got = decodeDec128(hi, lo)
    assert(got.coefficient == maxC && got.exponent == 0 && !got.negative)
    // one past the domain edge decodes as zero, not a wrapped value
    val over = maxC + 1
    val hi2 = (6176L << 49) | (over >> 64).toLong
    val lo2 = (over & BigInt("ffffffffffffffff", 16)).toLong
    assert(decodeDec128(hi2, lo2).coefficient == BigInt(0))
  }

  test("oplog tail against the stub mongod: hello, tailable find, getMore drain, delta conversion") {
    val oplog = Seq(
      goldenDoc, // insert shop.orders {_id:7, status:OPEN, total:12.5}
      BVal.doc("ts" -> BTs(1700000101L, 1L), "op" -> BStr("u"),
        "ns" -> BStr("shop.orders"),
        "o2" -> BVal.doc("_id" -> BInt(7)),
        "o" -> BVal.doc( // delta update: $set + $unset partial images
          "$set" -> BVal.doc("status" -> BStr("SHIPPED")),
          "$unset" -> BVal.doc("total" -> BBool(true)))),
      BVal.doc("ts" -> BTs(1700000102L, 1L), "op" -> BStr("u"),
        "ns" -> BStr("shop.orders"),
        "o2" -> BVal.doc("_id" -> BInt(8)),
        "o" -> BVal.doc("_id" -> BInt(8), "status" -> BStr("NEW"))), // replacement
      BVal.doc("ts" -> BTs(1700000103L, 1L), "op" -> BStr("d"),
        "ns" -> BStr("shop.orders"),
        "o" -> BVal.doc("_id" -> BInt(7))),
      BVal.doc("ts" -> BTs(1700000104L, 1L), "op" -> BStr("n"), // noop: skipped
        "ns" -> BStr(""), "o" -> BVal.doc("msg" -> BStr("periodic noop"))))
    val srv = new StubMongod(oplog, batchSize = 2)
    try {
      val client = new MongoClient("127.0.0.1", srv.port).connect()
      assert(client.serverMaxWireVersion == 17L)
      val entries = client.tailOplog(BTs(1700000000L, 0L)).toVector
      client.close()
      assert(srv.sawTailableFind, "find must be tailable (oplog cursor)")
      assert(srv.findFilterTs.contains(BTs(1700000000L, 0L)),
        "resume position must ride the find filter")
      assert(srv.getMores == 2, "5 entries / batch 2 = find + 2 getMores")
      assert(entries.size == 5)
      val changes = oplogChanges(entries.iterator).toVector
      assert(changes.map(_.op) == Vector("insert", "update", "update", "delete"))
      val ins = changes(0)
      assert(ins.database == "shop" && ins.collection == "orders" && ins.id == "7")
      assert(ins.data == Map("_id" -> "7", "status" -> "OPEN", "total" -> "12.5"))
      assert(ins.seq == (1700000100L << 32 | 2L))
      val delta = changes(1)
      assert(delta.id == "7" && delta.data == Map("status" -> "SHIPPED") &&
        delta.unsetKeys == Seq("total"))
      val repl = changes(2)
      assert(repl.id == "8" && repl.data("status") == "NEW" && repl.unsetKeys.isEmpty)
      assert(changes(3).op == "delete" && changes(3).id == "7")
    } finally srv.close()
  }

  test("SCRAM-SHA-256 RFC 7677 vectors: salted password, proof and server signature") {
    // the RFC's example: user "user", pass "pencil", nonce rOprNGfwEbeRWgbNEkqO
    val cnonce = "rOprNGfwEbeRWgbNEkqO"
    val snonce = cnonce + "%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0"
    val salt = java.util.Base64.getDecoder.decode("W22ZaJ0SNY7soEsUEjb6gQ==")
    val salted = Scram.saltedPassword("SCRAM-SHA-256", "user", "pencil", salt, 4096)
    val authMessage = s"n=user,r=$cnonce," +
      s"r=$snonce,s=W22ZaJ0SNY7soEsUEjb6gQ==,i=4096," +
      s"c=biws,r=$snonce"
    val proof = java.util.Base64.getEncoder.encodeToString(
      Scram.clientProof("SCRAM-SHA-256", salted, authMessage))
    assert(proof == "dHzbZapWIk4jUhN+Ute9ytag9zjfMHgsqmmiz7AndVQ=")
    val v = java.util.Base64.getEncoder.encodeToString(
      Scram.serverSignature("SCRAM-SHA-256", salted, authMessage))
    assert(v == "6rriTRBi23WpRR/wtup+mMhUZUn/dB5nLTJRsjl95G4=")
  }

  test("SCRAM-SHA-256 auth against the stub: unauthed find refused, proof verified server-side") {
    val srv = new StubMongod(Seq(goldenDoc),
      auth = Some(("tailer", "s3cret", "SCRAM-SHA-256")))
    try {
      val client = new MongoClient("127.0.0.1", srv.port).connect()
      // before auth the oplog is off-limits — code 13 Unauthorized
      val denied = intercept[RuntimeException](
        client.tailOplog(BTs(0L, 0L)).toVector)
      assert(denied.getMessage.contains("requires authentication"))
      assert(srv.refusedUnauthed == 1)
      client.authenticate("tailer", "s3cret")
      assert(srv.authOk, "stub must verify the client proof from stored credentials")
      val entries = client.tailOplog(BTs(0L, 0L)).toVector
      client.close()
      assert(entries.size == 1)
    } finally srv.close()
  }

  test("SCRAM-SHA-1 salts the MONGODB-CR digest, not the raw password") {
    // independent check of the md5 pre-hash quirk
    assert(Scram.mongoPassword("SCRAM-SHA-1", "tailer", "s3cret") ==
      java.security.MessageDigest.getInstance("MD5")
        .digest("tailer:mongo:s3cret".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString)
    val srv = new StubMongod(Seq(goldenDoc),
      auth = Some(("tailer", "s3cret", "SCRAM-SHA-1")))
    try {
      val client = new MongoClient("127.0.0.1", srv.port).connect()
      client.authenticate("tailer", "s3cret", "SCRAM-SHA-1")
      assert(srv.authOk)
      assert(client.tailOplog(BTs(0L, 0L)).toVector.size == 1)
      client.close()
    } finally srv.close()
  }

  test("SCRAM wrong password fails; a tampered server signature is refused by the CLIENT") {
    val srv = new StubMongod(Nil, auth = Some(("tailer", "s3cret", "SCRAM-SHA-256")))
    try {
      val client = new MongoClient("127.0.0.1", srv.port).connect()
      val e = intercept[RuntimeException](client.authenticate("tailer", "WRONG"))
      assert(e.getMessage.contains("Authentication failed"))
      assert(!srv.authOk)
      client.close()
    } finally srv.close()
    // server proves knowledge of the password too — a MITM that forwards
    // the proof but forges the signature must be refused client-side
    val mitm = new StubMongod(Nil,
      auth = Some(("tailer", "s3cret", "SCRAM-SHA-256")),
      tamperServerSignature = true)
    try {
      val client = new MongoClient("127.0.0.1", mitm.port).connect()
      val e = intercept[IllegalArgumentException](
        client.authenticate("tailer", "s3cret"))
      assert(e.getMessage.contains("SERVER signature"))
      client.close()
    } finally mitm.close()
  }
}
