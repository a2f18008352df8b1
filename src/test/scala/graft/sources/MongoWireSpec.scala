package graft.sources

import graft.sources.MongoWire._
import graft.sources.MongoWire.BVal._
import org.scalatest.funsuite.AnyFunSuite

/** A stub mongod: OP_MSG server answering hello, find on local.oplog.rs,
  * and getMore with canned batches — the server side of the cursor
  * protocol the tailer drives.
  */
final class StubMongod(oplog: Seq[BDoc], batchSize: Int = 2) extends AutoCloseable {
  private val server = new java.net.ServerSocket(0, 1,
    java.net.InetAddress.getLoopbackAddress)
  def port: Int = server.getLocalPort
  @volatile var sawTailableFind = false
  @volatile var findFilterTs: Option[BTs] = None
  @volatile var getMores = 0

  private val thread = new Thread(() => {
    try {
      val sock = server.accept()
      val in = new java.io.BufferedInputStream(sock.getInputStream)
      val out = new java.io.BufferedOutputStream(sock.getOutputStream)
      var remaining = oplog
      var cursorId = 7777L
      var open = true
      while (open) {
        val (reqId, _, body) =
          try readOpMsg(in) catch { case _: java.io.EOFException => open = false; (0, 0, BVal.doc()) }
        if (open) {
          val cmd = body.fields.headOption.map(_._1).getOrElse("")
          val reply: BDoc = cmd match {
            case "hello" =>
              BVal.doc("ok" -> BDouble(1.0), "maxWireVersion" -> BInt(17))
            case "find" =>
              sawTailableFind = body.get("tailable").contains(BBool(true))
              findFilterTs = body.doc("filter").flatMap(_.doc("ts"))
                .flatMap(_.get("$gt")).collect { case t: BTs => t }
              val (batch, rest) = remaining.splitAt(batchSize)
              remaining = rest
              BVal.doc("ok" -> BDouble(1.0), "cursor" -> BVal.doc(
                "id" -> BLong(if (remaining.isEmpty) 0L else cursorId),
                "ns" -> BStr("local.oplog.rs"),
                "firstBatch" -> BArr(batch)))
            case "getMore" =>
              getMores += 1
              val (batch, rest) = remaining.splitAt(batchSize)
              remaining = rest
              BVal.doc("ok" -> BDouble(1.0), "cursor" -> BVal.doc(
                "id" -> BLong(if (remaining.isEmpty) 0L else cursorId),
                "ns" -> BStr("local.oplog.rs"),
                "nextBatch" -> BArr(batch)))
            case other =>
              BVal.doc("ok" -> BDouble(0.0), "errmsg" -> BStr(s"no such command: $other"))
          }
          writeOpMsg(out, 1000 + reqId, reqId, reply)
        }
      }
      sock.close()
    } catch { case _: Exception => () }
  })
  thread.setDaemon(true)
  thread.start()
  def close(): Unit = server.close()
}

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
