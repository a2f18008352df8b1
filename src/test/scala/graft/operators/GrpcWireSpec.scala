package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The gRPC/h2c transport proven three ways: HPACK against the RFC 7541
  * Appendix C golden sequences (the same vectors every interoperable
  * implementation validates with), a Huffman encode/decode randomized
  * round-trip over the full symbol table, and real-socket client↔server
  * sessions including the complete go-plugin handshake with a child JVM
  * plugin process.
  */
class GrpcWireSpec extends AnyFunSuite {

  private def hex(s: String): Array[Byte] =
    s.replaceAll("\\s", "").sliding(2, 2).map(Integer.parseInt(_, 16).toByte).toArray

  // ----------------------------------------------------------- HPACK

  test("RFC 7541 C.3: request sequence without Huffman, dynamic table evolves") {
    val d = new GrpcWire.HpackDecoder()
    // C.3.1
    assert(d.decode(hex("828684410f7777772e6578616d706c652e636f6d")) == Seq(
      ":method" -> "GET", ":scheme" -> "http", ":path" -> "/",
      ":authority" -> "www.example.com"))
    // C.3.2 — 'be' hits the dynamic entry C.3.1 inserted
    assert(d.decode(hex("828684be58086e6f2d6361636865")) == Seq(
      ":method" -> "GET", ":scheme" -> "http", ":path" -> "/",
      ":authority" -> "www.example.com", "cache-control" -> "no-cache"))
    // C.3.3
    assert(d.decode(hex(
      "828785bf400a637573746f6d2d6b65790c637573746f6d2d76616c7565")) == Seq(
      ":method" -> "GET", ":scheme" -> "https", ":path" -> "/index.html",
      ":authority" -> "www.example.com", "custom-key" -> "custom-value"))
  }

  test("RFC 7541 C.4: the same requests Huffman-coded decode identically") {
    val d = new GrpcWire.HpackDecoder()
    assert(d.decode(hex("828684418cf1e3c2e5f23a6ba0ab90f4ff")) == Seq(
      ":method" -> "GET", ":scheme" -> "http", ":path" -> "/",
      ":authority" -> "www.example.com"))
    assert(d.decode(hex("828684be5886a8eb10649cbf")) == Seq(
      ":method" -> "GET", ":scheme" -> "http", ":path" -> "/",
      ":authority" -> "www.example.com", "cache-control" -> "no-cache"))
    assert(d.decode(hex(
      "828785bf408825a849e95ba97d7f8925a849e95bb8e8b4bf")) == Seq(
      ":method" -> "GET", ":scheme" -> "https", ":path" -> "/index.html",
      ":authority" -> "www.example.com", "custom-key" -> "custom-value"))
  }

  /** Test-local Huffman ENCODER from the public table — the decoder's
    * adversary for the round-trip property. The production encoder
    * deliberately never Huffman-codes, so this lives in the spec.
    */
  private def huffmanEncode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length)
    var acc = 0L
    var nbits = 0
    data.foreach { b =>
      val sym = b & 0xff
      acc = (acc << GrpcWire.Hpack.codeLens(sym)) | GrpcWire.Hpack.codes(sym)
      nbits += GrpcWire.Hpack.codeLens(sym)
      while (nbits >= 8) {
        nbits -= 8
        out.write(((acc >>> nbits) & 0xff).toInt)
      }
    }
    if (nbits > 0) {
      // pad with the EOS prefix (all ones), RFC 7541 §5.2
      out.write((((acc << (8 - nbits)) | ((1 << (8 - nbits)) - 1)) & 0xff).toInt)
    }
    out.toByteArray
  }

  test("Huffman decode round-trips randomized strings over the full byte alphabet") {
    val rnd = new scala.util.Random(0x48504143)
    (1 to 200).foreach { _ =>
      val n = 1 + rnd.nextInt(64)
      val bytes = new Array[Byte](n)
      // mix printable ASCII (short codes) and arbitrary octets (long codes)
      (0 until n).foreach { i =>
        bytes(i) =
          if (rnd.nextBoolean()) (0x20 + rnd.nextInt(95)).toByte
          else rnd.nextInt(256).toByte
      }
      val enc = huffmanEncode(bytes)
      val dec = GrpcWire.Hpack.huffmanDecode(enc, 0, enc.length)
      assert(dec == new String(bytes, java.nio.charset.StandardCharsets.UTF_8) ||
        dec.getBytes(java.nio.charset.StandardCharsets.UTF_8).sameElements(bytes) ||
        {
          // non-UTF8 byte runs can't round-trip through String equality;
          // compare the raw decode output instead
          val raw = dec.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
          raw.sameElements(bytes)
        }, s"huffman round-trip failed for ${bytes.map("%02x".format(_)).mkString}")
    }
  }

  test("Huffman rejects EOS in-stream and bad padding") {
    // EOS is 30 bits of ones: 0xff 0xff 0xff 0xfc
    intercept[IllegalArgumentException] {
      GrpcWire.Hpack.huffmanDecode(hex("fffffffc"), 0, 4)
    }
    // 'w' (1111000) + 9 padding bits would exceed the 7-bit limit
    intercept[IllegalArgumentException] {
      GrpcWire.Hpack.huffmanDecode(hex("f1ffff"), 0, 3)
    }
  }

  test("our raw-literal encoder is decodable and stateless") {
    val headers = Seq(
      ":method" -> "POST", ":scheme" -> "http",
      ":path" -> "/msgpb.FilterPlugin/Filter",
      "content-type" -> "application/grpc", "te" -> "trailers")
    val d = new GrpcWire.HpackDecoder()
    assert(d.decode(GrpcWire.Hpack.encode(headers)) == headers)
    // stateless: the same block decodes the same on a fresh connection
    assert(new GrpcWire.HpackDecoder().decode(GrpcWire.Hpack.encode(headers)) == headers)
  }

  // ------------------------------------------- client <-> server loopback

  test("unary calls over a real socket: echo, multiple sequential streams") {
    val server = new GrpcWire.GrpcWireServer(Map(
      "/test.Echo/Call" -> { req => ("echo:" + new String(req, "UTF-8")).getBytes("UTF-8") }
    ))
    try {
      val client = new GrpcWire.GrpcWireClient("127.0.0.1", server.port).connect()
      try {
        (1 to 50).foreach { i =>
          val rsp = client.call("/test.Echo/Call", s"m$i".getBytes("UTF-8"))
          assert(new String(rsp, "UTF-8") == s"echo:m$i")
        }
        import scala.jdk.CollectionConverters._
        assert(server.calls.asScala.size == 50)
      } finally client.close()
    } finally server.close()
  }

  test("flow control: 300KB request and response cross the 64KB initial windows") {
    val big = Array.tabulate[Byte](300 * 1024)(i => (i % 251).toByte)
    val server = new GrpcWire.GrpcWireServer(Map(
      "/test.Big/Swap" -> { req =>
        // verify the request arrived intact, respond with its reverse
        require(req.length == big.length, s"got ${req.length}")
        req.reverse
      }
    ))
    try {
      val client = new GrpcWire.GrpcWireClient("127.0.0.1", server.port).connect()
      try {
        val rsp = client.call("/test.Big/Swap", big)
        assert(rsp.length == big.length)
        assert(rsp.sameElements(big.reverse))
        // and the connection is still healthy for a second call
        assert(client.call("/test.Big/Swap", big).length == big.length)
      } finally client.close()
    } finally server.close()
  }

  test("grpc error mapping: handler throw -> status 2; unknown path -> 12") {
    val server = new GrpcWire.GrpcWireServer(Map(
      "/test.Boom/Go" -> { _ => sys.error("kaput") }
    ))
    try {
      val client = new GrpcWire.GrpcWireClient("127.0.0.1", server.port).connect()
      try {
        val e1 = intercept[GrpcWire.GrpcStatusException] {
          client.call("/test.Boom/Go", Array.emptyByteArray)
        }
        assert(e1.status == 2 && e1.getMessage.contains("kaput"))
        val e2 = intercept[GrpcWire.GrpcStatusException] {
          client.call("/test.Nope/Missing", Array.emptyByteArray)
        }
        assert(e2.status == 12)
        // the connection survives failed rpcs (new stream per call)
        val server2ok = intercept[GrpcWire.GrpcStatusException] {
          client.call("/test.Boom/Go", Array.emptyByteArray)
        }
        assert(server2ok.status == 2)
      } finally client.close()
    } finally server.close()
  }

  // ------------------------------------------------ go-plugin handshake

  private def sidecarCmd: Seq[String] = Seq(
    s"${sys.props("java.home")}/bin/java",
    "-cp", sys.props("java.class.path"),
    "graft.operators.MsgPbGrpcSidecar")

  test("go-plugin e2e: launch, handshake line, health, configure, filter, shutdown") {
    val plugin = new GrpcPluginClient(sidecarCmd)
    try {
      assert(plugin.healthCheck(), "health must report SERVING")
      plugin.configure(Seq("name" -> MsgPb.PbValue.Str("status-rewriter")))
      // mutation path
      val rsp = plugin.filter(MsgPb.Msg(
        version = "2.0.alpha", database = "db1", table = "orders",
        msgType = "dml",
        dml = Some(MsgPb.Dml("insert",
          data = Seq("o_orderstatus" -> MsgPb.PbValue.Str("O")),
          old = Nil,
          pks = Seq("o_orderkey" -> MsgPb.PbValue.Str("7"))))))
      assert(rsp.continueNext)
      assert(rsp.msg.flatMap(_.dml).get.data ==
        Seq("o_orderstatus" -> MsgPb.PbValue.Str("OPEN")))
      assert(rsp.msg.flatMap(_.dml).get.pks ==
        Seq("o_orderkey" -> MsgPb.PbValue.Str("7")))
      // drop path
      val dropped = plugin.filter(MsgPb.Msg(msgType = "dml",
        dml = Some(MsgPb.Dml("delete",
          data = Seq("o_orderstatus" -> MsgPb.PbValue.Str("F")), Nil, Nil))))
      assert(!dropped.continueNext)
    } finally plugin.close()
    // the controller Shutdown rpc must have produced a CLEAN exit
    assert(plugin.exitValue(5000).contains(0),
      "plugin must exit 0 after the controller Shutdown rpc")
  }

  test("the plugin binary refuses direct execution without the magic cookie") {
    val pb = new ProcessBuilder(sidecarCmd: _*)
    pb.environment().remove(PluginHandshake.CookieKey)
    val proc = pb.start()
    val err = new String(proc.getErrorStream.readAllBytes(), "UTF-8")
    assert(proc.waitFor(20, java.util.concurrent.TimeUnit.SECONDS))
    assert(proc.exitValue() == 1)
    assert(err.contains("This binary is a plugin"))
  }

  test("GrpcSidecarFilter: O->OPEN rewrite and delete-drop through the full stack") {
    val spark = graft.core.Engine.local("grpc-sidecar-filter", cores = 2)
    import org.apache.spark.sql.functions._
    val rows = spark.range(1, 21).toDF("seq")
      .withColumn("op", when(col("seq") % 5 === 0, "delete").otherwise("insert"))
      .withColumn("database", lit("db1"))
      .withColumn("table", lit("orders"))
      .withColumn("data", map(lit("o_orderstatus"),
        when(col("seq") % 2 === 0, "O").otherwise("F")))
      .withColumn("old", expr("map()").cast("map<string,string>"))
      .withColumn("pks", map(lit("o_orderkey"), col("seq").cast("string")))
      // two partitions -> two plugin launches, like two executor tasks
      .repartition(2)
    val out = GrpcSidecarFilter(sidecarCmd,
      configureData = Map("name" -> "status-rewriter"))(rows)
      .select(col("seq"), col("op"),
        element_at(col("data"), "o_orderstatus").as("status"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_._1)
    // deletes (seq % 5 == 0) dropped; even seq O -> OPEN; odd stays F
    assert(out.length == 16)
    assert(!out.exists(_._2 == "delete"))
    out.foreach { case (seq, _, status) =>
      assert(status == (if (seq % 2 == 0) "OPEN" else "F"),
        s"seq $seq status $status")
    }
  }
}
