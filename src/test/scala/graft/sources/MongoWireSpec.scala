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
      "i" -> BInt(Int.MinValue), "t" -> BTs(0xffffffffL, 1L), "l" -> BLong(Long.MinValue))
    assert(decodeDoc(encodeDoc(all)) == all)
    // element type 0x05 (binary) is outside the oplog subset
    val bad = unhex("0c0000000562000000000000" + "0000")
    val e = intercept[UnsupportedOperationException](decodeDoc(bad))
    assert(e.getMessage.contains("0x05"))
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
}
