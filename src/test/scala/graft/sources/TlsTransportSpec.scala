package graft.sources

import graft.TestTls
import graft.sinks.{EsRestSink, KafkaWireBatchSink, StubKafkaBroker}
import graft.sinks.KafkaWire.{KafkaWireConsumer, KafkaWireProducer}
import graft.sources.MongoWire.BVal
import graft.sources.MongoWire.BVal._
import org.scalatest.funsuite.AnyFunSuite

/** TLS across all four wire transports, each against its stub peer
  * running a real TLS listener (self-signed cert, SAN localhost +
  * 127.0.0.1, endpoint identification ON client-side):
  *
  *   - Kafka: TLS from byte zero (an SSL listener), producer + consumer;
  *   - Mongo: TLS from byte zero (tlsMode=requireTLS);
  *   - MySQL: STARTTLS — plain handshake, SSLRequest, channel upgrade,
  *     credentials only ever on the encrypted channel
  *     (require_secure_transport=ON server side);
  *   - ES: HTTPS with the JDK client's hostname verification intact.
  *
  * Every positive path is paired with the negative that matters: a
  * client trusting the WRONG certificate must fail the handshake (no
  * credentials, no data move), and a plaintext client against a
  * TLS-required listener is refused.
  */
class TlsTransportSpec extends AnyFunSuite {

  test("kafka: produce + fetch over a TLS listener; untrusted cert and plaintext refused") {
    val broker = new StubKafkaBroker(tls = Some(TestTls.serverCtx))
    try {
      val p = new KafkaWireProducer("127.0.0.1", broker.port,
        tls = Some(TestTls.clientCtx)).connect()
      assert(p.produce("t", 0, Seq(("k".getBytes("UTF-8"), "v".getBytes("UTF-8")))) == 0L)
      p.close()
      val c = new KafkaWireConsumer("127.0.0.1", broker.port,
        tls = Some(TestTls.clientCtx)).connect()
      val (hw, recs) = c.poll("t", 0, 0L)
      assert(hw == 1L)
      assert(recs.map { case (_, k, v) =>
        (new String(k, "UTF-8"), new String(v, "UTF-8")) } == Seq(("k", "v")))
      c.close()
      // trusting the wrong cert: handshake fails before any Kafka frame
      intercept[Exception] {
        new KafkaWireProducer("127.0.0.1", broker.port,
          tls = Some(TestTls.strangerClientCtx)).connect()
      }
      // plaintext against the TLS listener: refused, nothing lands
      intercept[Exception] {
        new KafkaWireProducer("127.0.0.1", broker.port).connect()
          .produce("t", 0, Seq(("x".getBytes("UTF-8"), "y".getBytes("UTF-8"))))
      }
      assert(broker.log.get(("t", 0)).size == 1, "refused produce must not land")
    } finally broker.close()
  }

  test("kafka-wire sink over TLS: executor tasks build contexts from the truststore") {
    val spark = graft.core.Engine.local("kafka-wire-tls", cores = 2)
    import spark.implicits._
    val broker = new StubKafkaBroker(tls = Some(TestTls.serverCtx))
    try {
      val sink = new KafkaWireBatchSink("127.0.0.1", broker.port,
        numPartitions = 2, topic = "t-tls", pkCols = Seq("id"),
        tls = Some((TestTls.keystorePath, TestTls.password)))
      val b = Seq(
        (1L, "insert", "db0", "orders", 1L, "a"),
        (2L, "insert", "db0", "orders", 2L, "b"),
        (3L, "update", "db0", "orders", 1L, "a2"))
        .toDF("seq", "op", "database", "table", "id", "v")
      sink.write(0L, b)
      import scala.jdk.CollectionConverters._
      val total = broker.log.asScala.collect {
        case ((t, _), buf) if t == "t-tls" => buf.size }.sum
      assert(total == 3)
      val ids = broker.clientIds.asScala.toSet
      assert(ids.nonEmpty && ids.forall(_.startsWith("graft-exec-")),
        s"TLS produce must still run inside executor tasks, saw $ids")
    } finally broker.close()
  }

  test("mongo: oplog tail over TLS (tlsMode=requireTLS); untrusted cert refused") {
    val oplog = Seq(BVal.doc(
      "ts" -> BTs(1700000100L, 2L), "op" -> BStr("i"),
      "ns" -> BStr("shop.orders"),
      "o" -> BVal.doc("_id" -> BInt(7), "status" -> BStr("OPEN"))))
    val srv = new StubMongod(oplog, tls = Some(TestTls.serverCtx))
    try {
      val client = new MongoWire.MongoClient("127.0.0.1", srv.port,
        tls = Some(TestTls.clientCtx)).connect()
      assert(client.serverMaxWireVersion == 17L)
      val entries = client.tailOplog(BTs(1700000000L, 0L)).toVector
      client.close()
      assert(entries.size == 1)
      assert(srv.sawTailableFind)
      intercept[Exception] {
        new MongoWire.MongoClient("127.0.0.1", srv.port,
          tls = Some(TestTls.strangerClientCtx)).connect()
      }
    } finally srv.close()
  }

  test("mysql: STARTTLS — SSLRequest + upgrade, auth and dump on the encrypted channel") {
    val cols = Seq((3, 0, false))
    val colMeta = cols.map { case (t, m, _) => (t, m) }
    val events = Seq(
      StubBinlog.fde(),
      StubBinlog.tableMap(42L, "db1", "t", cols),
      StubBinlog.writeRows(42L, colMeta, Seq(Seq(7))),
      StubBinlog.xid(9L))
    val srv = new StubMySqlServer("repl", "replpass", events,
      tls = Some(TestTls.serverCtx))
    try {
      val client = new BinlogWire.BinlogClient("127.0.0.1", srv.port,
        "repl", "replpass", tls = Some(TestTls.clientCtx))
      client.connect()
      assert(srv.sawSslRequest, "client must send SSLRequest before credentials")
      assert(srv.authOk, "scramble must verify over the upgraded channel")
      val got = client.dump("mysql-bin.000001", 4L).toVector
      client.close()
      assert(got.collect { case x: BinlogWire.Xid => x.xid } == Vector(9L))
      assert(got.collect { case r: BinlogWire.Rows => r.rows.map(_._2) }.flatten ==
        Vector(IndexedSeq(7)))
      // require_secure_transport=ON: plaintext handshake response refused
      intercept[Exception] {
        new BinlogWire.BinlogClient("127.0.0.1", srv.port,
          "repl", "replpass").connect()
      }
      assert(srv.plaintextRefused >= 1)
      // wrong trust anchor: the upgrade fails, credentials never sent
      intercept[Exception] {
        new BinlogWire.BinlogClient("127.0.0.1", srv.port,
          "repl", "replpass", tls = Some(TestTls.strangerClientCtx)).connect()
      }
    } finally srv.close()
  }

  test("mysql: caching_sha2 full auth on TLS sends the cleartext password, no RSA round-trip") {
    val events = Seq(StubBinlog.fde(), StubBinlog.xid(5L))
    val srv = new StubMySqlServer("repl", "replpass", events,
      authMode = "sha2-full", tls = Some(TestTls.serverCtx))
    try {
      val client = new BinlogWire.BinlogClient("127.0.0.1", srv.port,
        "repl", "replpass", tls = Some(TestTls.clientCtx))
      client.connect()
      assert(srv.sawSslRequest && srv.authOk)
      assert(srv.sawCleartextFullAuth,
        "a TLS channel must answer full auth with the cleartext form, not RSA")
      val got = client.dump("mysql-bin.000001", 4L).toVector
      client.close()
      assert(got.collect { case x: BinlogWire.Xid => x.xid } == Vector(5L))
    } finally srv.close()
  }

  test("kafka streaming seat reads a TLS listener via tlsTruststore options") {
    val spark = graft.core.Engine.local("kafka-stream-tls", cores = 2)
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val broker = new StubKafkaBroker(tls = Some(TestTls.serverCtx))
    try {
      val p = new KafkaWireProducer("127.0.0.1", broker.port,
        tls = Some(TestTls.clientCtx)).connect()
      p.produce("cdc", 0, (0 until 4).map(i =>
        (s"k$i".getBytes("UTF-8"), s"""{"n":$i}""".getBytes("UTF-8"))),
        timestampMs = 1700000000000L)
      p.close()
      val out = "kafka_stream_tls"
      val q = spark.readStream.format("graft.sources.KafkaStreamSource")
        .option("host", "127.0.0.1").option("port", broker.port)
        .option("topic", "cdc").option("stopAtHighWater", true)
        .option("tlsTruststore", TestTls.keystorePath)
        .option("tlsPassword", TestTls.password)
        .load()
        .writeStream.format("memory").queryName(out)
        .trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination() finally q.stop()
      val got = spark.table(out).selectExpr("seq", "key", "value")
        .as[(Long, String, String)].collect().sortBy(_._1)
      assert(got.toSeq == (0 until 4).map(i => (i.toLong, s"k$i", s"""{"n":$i}""")))
    } finally broker.close()
  }

  test("mysql: ssl-mode=REQUIRED against a server without SSL fails loudly, pre-credentials") {
    val srv = new StubMySqlServer("repl", "replpass", Seq(StubBinlog.fde()))
    try {
      val e = intercept[IllegalArgumentException] {
        new BinlogWire.BinlogClient("127.0.0.1", srv.port,
          "repl", "replpass", tls = Some(TestTls.clientCtx)).connect()
      }
      assert(e.getMessage.contains("CLIENT_SSL"))
      assert(!srv.authOk, "no credentials may move on the refused session")
    } finally srv.close()
  }

  test("es: HTTPS cluster; bulk over TLS, untrusted cert refused") {
    val server = com.sun.net.httpserver.HttpsServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.setHttpsConfigurator(
      new com.sun.net.httpserver.HttpsConfigurator(TestTls.serverCtx))
    @volatile var sawNdjson = false
    server.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
      sawNdjson = Option(ex.getRequestHeaders.getFirst("Content-Type"))
        .exists(_.contains("x-ndjson"))
      val resp = """{"errors":false,"items":[{"index":{"status":201}}]}"""
        .getBytes("UTF-8")
      ex.sendResponseHeaders(200, resp.length)
      ex.getResponseBody.write(resp)
      ex.close()
    })
    server.start()
    val url = s"https://127.0.0.1:${server.getAddress.getPort}"
    try {
      val sink = new EsRestSink(url, sslContext = Some(TestTls.clientCtx))
      val (n, failed) = sink.bulk(Seq(
        """{"index":{"_index":"i","_id":"1"}}""", """{"f":1}"""))
      assert(n == 1 && failed.isEmpty && sawNdjson)
      val bad = new EsRestSink(url, retries = 1, retrySleepMs = 1,
        sslContext = Some(TestTls.strangerClientCtx))
      intercept[Exception] { bad.bulk(Seq("""{"x":{}}""")) }
    } finally server.stop(0)
  }
}
