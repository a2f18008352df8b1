package graft.sources

import graft.sources.MongoWire._
import graft.sources.MongoWire.BVal._

/** A stub mongod: OP_MSG server answering hello, find on local.oplog.rs,
  * and getMore with canned batches — the server side of the cursor
  * protocol the tailer drives. Accepts connections in a loop (a resumed
  * streaming query reconnects); each connection replays the canned oplog
  * FILTERED by the find's `ts: {$gt: …}` — the real oplog query shape —
  * and connections after the first also see `moreOplog` appended (the
  * primary advanced while the client was away).
  */
final class StubMongod(oplog: Seq[BDoc], batchSize: Int = 2,
    moreOplog: Seq[BDoc] = Nil) extends AutoCloseable {
  private val server = new java.net.ServerSocket(0, 1,
    java.net.InetAddress.getLoopbackAddress)
  def port: Int = server.getLocalPort
  @volatile var sawTailableFind = false
  @volatile var findFilterTs: Option[BTs] = None
  @volatile var getMores = 0
  @volatile var conns = 0

  private def tsOf(e: BDoc): (Long, Long) =
    e.get("ts").collect { case BTs(s, i) => (s, i) }.getOrElse((0L, 0L))

  private val thread = new Thread(() => {
    try while (!server.isClosed) {
      val sock = server.accept()
      conns += 1
      try serve(sock, if (conns > 1) oplog ++ moreOplog else oplog)
      catch { case _: Exception => () }
      finally { try sock.close() catch { case _: Exception => () } }
    } catch { case _: Exception => () }
  })

  private def serve(sock: java.net.Socket, entries: Seq[BDoc]): Unit = {
    val in = new java.io.BufferedInputStream(sock.getInputStream)
    val out = new java.io.BufferedOutputStream(sock.getOutputStream)
    var remaining = entries
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
            // honor the resume filter like the real oplog query does
            findFilterTs.foreach { case BTs(fs, fi) =>
              remaining = remaining.filter { e =>
                val (s, i) = tsOf(e)
                s > fs || (s == fs && i > fi)
              }
            }
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
  }

  thread.setDaemon(true)
  thread.start()
  def close(): Unit = server.close()
}
