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
    moreOplog: Seq[BDoc] = Nil,
    /** when set (user, password, mechanism): find/getMore are refused
      * until a SCRAM conversation proves the client holds the password —
      * verification runs SERVER-side from the stored credentials, and
      * the stub answers with its server signature like a real mongod */
    auth: Option[(String, String, String)] = None,
    /** corrupt the server signature — a client that fails to verify v=
      * would silently trust a MITM */
    tamperServerSignature: Boolean = false,
    /** tlsMode=requireTLS: every accepted connection must complete a
      * TLS handshake before any OP_MSG moves */
    tls: Option[javax.net.ssl.SSLContext] = None,
    /** networkMessageCompressors the server side accepts; the hello
      * reply echoes the subset of the client's offer, and subsequent
      * replies to a negotiated connection ride OP_COMPRESSED */
    supportedCompressors: Seq[String] = Nil) extends AutoCloseable {
  private val server = new java.net.ServerSocket(0, 1,
    java.net.InetAddress.getLoopbackAddress)
  def port: Int = server.getLocalPort
  @volatile var sawTailableFind = false
  @volatile var findFilterTs: Option[BTs] = None
  @volatile var getMores = 0
  @volatile var conns = 0
  @volatile var authOk = false
  @volatile var refusedUnauthed = 0
  @volatile var compressedRequests = 0
  @volatile var compressedReplies = 0

  private def tsOf(e: BDoc): (Long, Long) =
    e.get("ts").collect { case BTs(s, i) => (s, i) }.getOrElse((0L, 0L))

  private val thread = new Thread(() => {
    try while (!server.isClosed) {
      val sock = server.accept()
      conns += 1
      try serve(tls.fold(sock)(ctx => Tls.upgradeServer(ctx, sock)),
        if (conns > 1) oplog ++ moreOplog else oplog)
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
    // per-connection SCRAM conversation state
    var connAuthed = auth.isEmpty
    var convSalted: Array[Byte] = null
    var convAuthMessage: String = null
    var convMech: String = null
    val salt = (1 to 16).map(_.toByte).toArray
    val iterations = 4096
    var connCompressor: Option[String] = None
    while (open) {
      val (reqId, _, body, wasCompressed) =
        try readMsg(in) catch { case _: java.io.EOFException =>
          open = false; (0, 0, BVal.doc(), false) }
      if (wasCompressed) compressedRequests += 1
      if (open) {
        val cmd = body.fields.headOption.map(_._1).getOrElse("")
        def unauthorized(): BDoc = {
          refusedUnauthed += 1
          BVal.doc("ok" -> BDouble(0.0), "code" -> BInt(13),
            "errmsg" -> BStr(s"command $cmd requires authentication"))
        }
        val reply: BDoc = cmd match {
          case "hello" =>
            val offered = body.get("compression").collect {
              case BArr(items) => items.collect { case BStr(s) => s } }
              .getOrElse(Nil)
            val agreed = offered.filter(supportedCompressors.contains)
            connCompressor = agreed.headOption
            val base = Seq[(String, BVal)]("ok" -> BDouble(1.0),
              "maxWireVersion" -> BInt(17))
            BDoc(if (agreed.isEmpty) base
              else base :+ ("compression" -> BArr(agreed.map(BStr(_)))))
          case "saslStart" =>
            val (user, _, mech) = auth.getOrElse(("", "", ""))
            val gotMech = body.str("mechanism").getOrElse("")
            val payload = new String(body.get("payload").collect {
              case BBin(b) => b.toArray }.getOrElse(Array.emptyByteArray), "UTF-8")
            if (auth.isEmpty || gotMech != mech)
              BVal.doc("ok" -> BDouble(0.0),
                "errmsg" -> BStr(s"unsupported mechanism $gotMech"))
            else {
              // client-first: gs2 header "n,," then n=<user>,r=<nonce>
              require(payload.startsWith("n,,"), s"stub: bad gs2 header in '$payload'")
              val bare = payload.drop(3)
              val a = Scram.attrs(bare)
              require(a.get("n").contains(Scram.saslName(user)),
                s"stub: unexpected user ${a.get("n")}")
              val cnonce = a("r")
              val snonce = cnonce + "srvExt16"
              val serverFirst =
                s"r=$snonce,s=${java.util.Base64.getEncoder.encodeToString(salt)},i=$iterations"
              convMech = mech
              val (_, password, _) = auth.get
              convSalted = Scram.saltedPassword(mech, user, password, salt, iterations)
              convAuthMessage = s"$bare,$serverFirst,c=biws,r=$snonce"
              BVal.doc("ok" -> BDouble(1.0), "conversationId" -> BInt(1),
                "done" -> BBool(false),
                "payload" -> BBin(serverFirst.getBytes("UTF-8").toVector))
            }
          case "saslContinue" =>
            val payload = new String(body.get("payload").collect {
              case BBin(b) => b.toArray }.getOrElse(Array.emptyByteArray), "UTF-8")
            val a = Scram.attrs(payload)
            if (convSalted == null || !a.contains("p"))
              BVal.doc("ok" -> BDouble(0.0), "errmsg" -> BStr("no SASL conversation"))
            else {
              // verify the proof the RFC way: ClientKey' = proof XOR
              // ClientSignature must hash to the stored key
              val proof = java.util.Base64.getDecoder.decode(a("p"))
              val stored = Scram.storedKey(convMech,
                Scram.clientKey(convMech, convSalted))
              val sig = Scram.hmac(convMech, stored,
                convAuthMessage.getBytes("UTF-8"))
              val pass = proof.length == sig.length && {
                val ck = proof.indices.map(i => (proof(i) ^ sig(i)).toByte).toArray
                java.util.Arrays.equals(Scram.h(convMech, ck), stored)
              }
              if (!pass)
                BVal.doc("ok" -> BDouble(0.0), "code" -> BInt(18),
                  "errmsg" -> BStr("Authentication failed"))
              else {
                connAuthed = true; authOk = true
                var v = Scram.serverSignature(convMech, convSalted, convAuthMessage)
                if (tamperServerSignature) v = v.map(b => (b ^ 0x5a).toByte)
                BVal.doc("ok" -> BDouble(1.0), "conversationId" -> BInt(1),
                  "done" -> BBool(true),
                  "payload" -> BBin(
                    s"v=${java.util.Base64.getEncoder.encodeToString(v)}"
                      .getBytes("UTF-8").toVector))
              }
            }
          case "find" | "getMore" if !connAuthed => unauthorized()
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
        // a negotiated connection's replies ride OP_COMPRESSED too
        // (except the handshake/auth commands, per the spec)
        connCompressor match {
          case Some(c) if !MongoClient.Uncompressible(cmd) =>
            compressedReplies += 1
            writeOpCompressed(out, 1000 + reqId, reqId, reply, c)
          case _ => writeOpMsg(out, 1000 + reqId, reqId, reply)
        }
      }
    }
  }

  thread.setDaemon(true)
  thread.start()
  def close(): Unit = server.close()
}
