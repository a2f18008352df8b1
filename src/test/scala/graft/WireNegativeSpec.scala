package graft

import org.scalatest.funsuite.AnyFunSuite

/** Negative-path conformance sweep for the five wire clients
  * (BinlogWire, MongoWire, KafkaWire, GrpcWire, EsRestSink): a hostile
  * or broken peer feeds truncated frames, oversize/negative length
  * prefixes, wrong correlation ids, mid-frame EOFs, and silent stalls —
  * and every client must FAIL LOUDLY within a bounded time, never hang
  * a tailer/sink thread. The harness itself enforces the bound: each
  * operation runs on its own thread with a hard join deadline, so a
  * regression to blocking-forever fails the test rather than wedging
  * the suite.
  */
class WireNegativeSpec extends AnyFunSuite {

  /** One-shot TCP peer: accepts one connection, discards whatever the
    * client writes (a background drain), serves `response`, then either
    * closes or stalls until the case ends.
    */
  private def withPeer[T](response: Array[Byte], closeAfter: Boolean)
      (f: Int => T): T = {
    val server = new java.net.ServerSocket(0)
    val done = new java.util.concurrent.CountDownLatch(1)
    val t = new Thread(() => {
      try {
        val s = server.accept()
        val drain = new Thread(() => {
          try { val buf = new Array[Byte](4096)
            while (s.getInputStream.read(buf) >= 0) () }
          catch { case _: Throwable => () }
        })
        drain.setDaemon(true); drain.start()
        s.getOutputStream.write(response)
        s.getOutputStream.flush()
        if (closeAfter) s.close()
        else { done.await(20, java.util.concurrent.TimeUnit.SECONDS); s.close() }
      } catch { case _: Throwable => () }
    })
    t.setDaemon(true); t.start()
    try f(server.getLocalPort)
    finally { done.countDown(); server.close() }
  }

  /** Run `op`, requiring it to THROW within `deadlineMs` — the
    * fail-loud-never-hang contract, enforced by a hard thread join.
    */
  private def mustFailFast(label: String, deadlineMs: Long)(op: => Any): Throwable = {
    val err = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val ok = new java.util.concurrent.atomic.AtomicBoolean(false)
    val t = new Thread(() => {
      try { op; ok.set(true) } catch { case e: Throwable => err.set(e) }
    })
    t.setDaemon(true)
    val t0 = System.nanoTime()
    t.start()
    t.join(deadlineMs)
    val elapsed = (System.nanoTime() - t0) / 1e6
    assert(!t.isAlive, s"$label: still blocked after $deadlineMs ms — the client hangs")
    assert(!ok.get(), s"$label: operation SUCCEEDED against a corrupt peer")
    assert(err.get() != null, s"$label: no outcome")
    assert(elapsed <= deadlineMs, s"$label: took $elapsed ms")
    err.get()
  }

  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def be32(v: Int): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  // ------------------------------------------------------------- binlog

  test("binlog client: corrupt handshake table") {
    val cases: Seq[(String, Array[Byte], Boolean, String => Boolean)] = Seq(
      ("mid-header EOF", Array[Byte](0x40, 0x00), true,
        m => m.contains("connection closed")),
      ("mid-frame EOF (header claims 100 bytes, 10 arrive)",
        Array[Byte](100, 0, 0, 0) ++ Array.fill(10)(0x41.toByte), true,
        m => m.contains("truncated")),
      ("stall mid-frame", Array[Byte](100, 0, 0, 0) ++ Array.fill(10)(0x41.toByte),
        false, m => m != null), // SocketTimeoutException("Read timed out")
      ("garbage handshake payload",
        Array[Byte](8, 0, 0, 0) ++ Array.fill(8)(0xee.toByte), true,
        _ => true))
    cases.foreach { case (name, resp, close, msgOk) =>
      val e = withPeer(resp, close) { port =>
        mustFailFast(s"binlog/$name", 5000) {
          new graft.sources.BinlogWire.BinlogClient("127.0.0.1", port, "u", "p",
            handshakeTimeoutMs = 500).connect()
        }
      }
      assert(msgOk(e.getMessage), s"binlog/$name: unexpected ${e.toString}")
      if (name == "stall mid-frame")
        assert(e.isInstanceOf[java.net.SocketTimeoutException], s"binlog/$name: $e")
    }
  }

  // -------------------------------------------------------------- mongo

  test("mongo client: corrupt frame table") {
    import graft.sources.MongoWire
    val okReplyWrongCorrelation: Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      MongoWire.writeOpMsg(bos, 7777, 999, // responseTo 999, request was 1
        MongoWire.BVal.doc("ok" -> MongoWire.BVal.BDouble(1.0),
          "maxWireVersion" -> MongoWire.BVal.BInt(17)))
      bos.toByteArray
    }
    val cases: Seq[(String, Array[Byte], Boolean, String => Boolean)] = Seq(
      ("mid-header EOF", Array[Byte](0x10, 0x00), true,
        m => m.contains("connection closed")),
      ("negative length prefix", le32(-1), true,
        m => m.contains("implausible message length")),
      ("oversize length prefix (2 GB claim)", le32(0x7ff00000), true,
        m => m.contains("implausible message length")),
      ("mid-frame EOF", le32(100) ++ le32(1) ++ le32(1) ++ le32(2013) ++
        Array.fill(8)(0.toByte), true,
        m => m.contains("truncated")),
      ("wrong responseTo (correlation)", okReplyWrongCorrelation, true,
        m => m.contains("responseTo 999")),
      ("stall before reply", Array.emptyByteArray, false, m => m != null))
    cases.foreach { case (name, resp, close, msgOk) =>
      val e = withPeer(resp, close) { port =>
        mustFailFast(s"mongo/$name", 5000) {
          new MongoWire.MongoClient("127.0.0.1", port, readTimeoutMs = 500)
            .connect()
        }
      }
      assert(msgOk(e.getMessage), s"mongo/$name: unexpected ${e.toString}")
      if (name == "stall before reply")
        assert(e.isInstanceOf[java.net.SocketTimeoutException], s"mongo/$name: $e")
    }
  }

  // -------------------------------------------------------------- kafka

  test("kafka producer: corrupt response table") {
    import graft.sinks.KafkaWire
    // correlation for the first produce after connect() is 11
    val wrongCid = be32(999) ++ be32(0) ++ be32(0) // cid, 0 topics, throttle
    val cases: Seq[(String, Array[Byte], Boolean, String => Boolean)] = Seq(
      ("mid-header EOF", Array[Byte](0x00, 0x00), true,
        m => m.contains("connection closed")),
      ("oversize length prefix", be32(0x7fffffff), true,
        m => m.contains("implausible frame length")),
      ("mid-frame EOF", be32(100) ++ Array.fill(10)(0.toByte), true,
        m => m.contains("truncated frame")),
      ("wrong correlation id", be32(wrongCid.length) ++ wrongCid, true,
        m => m.contains("correlation mismatch")),
      ("stall before response", Array.emptyByteArray, false, m => m != null))
    cases.foreach { case (name, resp, close, msgOk) =>
      val e = withPeer(resp, close) { port =>
        mustFailFast(s"kafka/$name", 5000) {
          val p = new KafkaWire.KafkaWireProducer("127.0.0.1", port,
            readTimeoutMs = 500).connect()
          p.produce("t", 0, Seq(("k".getBytes, "v".getBytes)))
        }
      }
      assert(msgOk(e.getMessage), s"kafka/$name: unexpected ${e.toString}")
      if (name == "stall before response")
        assert(e.isInstanceOf[java.net.SocketTimeoutException], s"kafka/$name: $e")
    }
  }

  // --------------------------------------------------------------- grpc

  test("grpc client: corrupt h2 table") {
    import graft.operators.GrpcWire
    val cases: Seq[(String, Array[Byte], Boolean)] = Seq(
      ("EOF instead of SETTINGS", Array.emptyByteArray, true),
      ("garbage frame bytes", Array.fill(24)(0xa5.toByte), true),
      // a frame header claiming a 64 KB payload that never arrives
      ("mid-frame stall", Array[Byte](0x01, 0x00, 0x00, 0x04, 0x00,
        0x00, 0x00, 0x00, 0x00), false),
      ("stall before any frame", Array.emptyByteArray, false))
    cases.foreach { case (name, resp, close) =>
      val e = withPeer(resp, close) { port =>
        mustFailFast(s"grpc/$name", 5000) {
          val c = new GrpcWire.GrpcWireClient("127.0.0.1", port,
            readTimeoutMs = 500).connect()
          c.call("/pkg.Svc/Method", Array[Byte](1, 2, 3))
        }
      }
      if (name.contains("stall"))
        assert(e.isInstanceOf[java.net.SocketTimeoutException], s"grpc/$name: $e")
    }
  }

  // ----------------------------------------------------------------- es

  test("es rest sink: corrupt http table") {
    val cases: Seq[(String, Array[Byte], Boolean)] = Seq(
      ("closed mid-body (Content-Length 100, 3 bytes arrive)",
        "HTTP/1.1 200 OK\r\nContent-Length: 100\r\n\r\nabc".getBytes, true),
      ("garbage status line", "NOT-HTTP!!!\r\n\r\n".getBytes, true),
      ("stall before response", Array.emptyByteArray, false))
    cases.foreach { case (name, resp, close) =>
      val e = withPeer(resp, close) { port =>
        mustFailFast(s"es/$name", 8000) {
          // mappingProps is a GET that READS the body (indexExists is a
          // HEAD — a truncated body is legitimately invisible to it)
          new graft.sinks.EsRestSink(s"http://127.0.0.1:$port", retries = 0,
            requestTimeoutSeconds = 1).mappingProps("idx")
        }
      }
      assert(e.isInstanceOf[java.io.IOException], s"es/$name: $e")
      if (name == "stall before response")
        assert(e.getCause.isInstanceOf[java.net.http.HttpTimeoutException] ||
          e.isInstanceOf[java.net.http.HttpTimeoutException], s"es/$name: $e")
    }
  }
}
