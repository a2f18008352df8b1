package graft.sinks

import graft.sinks.KafkaWire._
import org.scalatest.funsuite.AnyFunSuite

/** A stub Kafka broker: accepts framed ProduceRequest v2, parses the
  * header + topic data, CRC-validates every message (rejecting corrupt
  * batches with error 2, the broker's CORRUPT_MESSAGE), appends to an
  * in-memory partition log, and answers ProduceResponse v2 with the
  * assigned base offset.
  */
final class StubKafkaBroker(
    /** serve fetches as RecordBatch v2 (magic 2) instead of
      * down-converted v1 sets — what a modern topic returns — with the
      * given batch codec (0=none … 4=zstd) */
    serveV2Batches: Boolean = false, v2Codec: Int = 0,
    /** (user, password, mechanism): a security-enabled listener —
      * produce/fetch are refused (connection closed, like a real
      * broker) until SASL/SCRAM proves the client holds the password,
      * verified server-side from stored credentials */
    saslAuth: Option[(String, String, String)] = None,
    /** a TLS (SSL / SASL_SSL) listener: every accepted connection must
      * complete a TLS handshake before any Kafka frame moves */
    tls: Option[javax.net.ssl.SSLContext] = None) extends AutoCloseable {
  private val server = new java.net.ServerSocket(0, 16,
    java.net.InetAddress.getLoopbackAddress)
  def port: Int = server.getLocalPort

  val log = new java.util.concurrent.ConcurrentHashMap[(String, Int),
    scala.collection.mutable.ArrayBuffer[(Array[Byte], Array[Byte])]]()
  @volatile var lastClientId = ""
  /** Every client id seen — lets a spec prove WHERE produce ran
    * (executor tasks stamp their partition id into the client id).
    */
  val clientIds = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private val thread = new Thread(() => {
    // executor tasks produce concurrently: serve each connection on its
    // own thread, like a real broker
    try while (!server.isClosed) {
      val sock = server.accept()
      val worker = new Thread(() => {
        // a dropped client must not kill the accept loop
        try serve(tls.fold(sock)(ctx => graft.sources.Tls.upgradeServer(ctx, sock)))
        catch { case _: Exception => () }
        finally { try sock.close() catch { case _: Exception => () } }
      })
      worker.setDaemon(true)
      worker.start()
    } catch { case _: Exception => () }
  })

  @volatile var saslOk = false

  private def serve(sock: java.net.Socket): Unit = {
    val in = new java.io.BufferedInputStream(sock.getInputStream)
    val out = new java.io.BufferedOutputStream(sock.getOutputStream)
    var open = true
    // per-connection SASL conversation state
    var authed = saslAuth.isEmpty
    var convSalted: Array[Byte] = null
    var convAuthMessage: String = null
    var convMech: String = null
    val saslSalt = (21 to 36).map(_.toByte).toArray
    while (open) {
      val frame = try readFrame(in) catch { case _: java.io.EOFException => open = false; Array.emptyByteArray }
      if (open) {
        val r = new Reader(frame)
        val apiKey = r.i16(); val apiVersion = r.i16()
        val correlationId = r.i32(); lastClientId = r.str()
        clientIds.add(lastClientId)
        apiKey match {
          case 17 => // SaslHandshake v1
            val mech = r.str()
            val want = saslAuth.map(_._3).getOrElse("")
            val w = new Writer().i32(correlationId)
            if (saslAuth.isEmpty || mech != want)
              w.i16(33) // UNSUPPORTED_SASL_MECHANISM
            else w.i16(0)
            w.i32(1).str(if (want.isEmpty) "SCRAM-SHA-256" else want)
            writeFrame(out, w.result())
          case 36 => // SaslAuthenticate v0
            import graft.sources.MongoWire.Scram
            val payload = new String(r.bytes(), "UTF-8")
            val (user, password, mech) = saslAuth.getOrElse(("", "", ""))
            def fail(msg: String): Unit = writeFrame(out,
              new Writer().i32(correlationId).i16(58) // SASL_AUTHENTICATION_FAILED
                .str(msg).bytes(Array.emptyByteArray).result())
            if (payload.startsWith("n,,")) {
              val bare = payload.drop(3)
              val a = Scram.attrs(bare)
              if (!a.get("n").contains(Scram.saslName(user))) fail("unknown user")
              else {
                val snonce = a("r") + "kafkaSrvExt"
                val serverFirst = s"r=$snonce,s=${java.util.Base64.getEncoder
                  .encodeToString(saslSalt)},i=4096"
                convMech = mech
                // kafka salts the RAW password (no scheme pre-hash)
                convSalted = Scram.saltedPasswordOf(mech, password, saslSalt, 4096)
                convAuthMessage = s"$bare,$serverFirst,c=biws,r=$snonce"
                writeFrame(out, new Writer().i32(correlationId).i16(0).i16(-1)
                  .bytes(serverFirst.getBytes("UTF-8")).result())
              }
            } else {
              val a = Scram.attrs(payload)
              if (convSalted == null || !a.contains("p")) fail("no SASL conversation")
              else {
                val proof = java.util.Base64.getDecoder.decode(a("p"))
                val stored = Scram.storedKey(convMech,
                  Scram.clientKey(convMech, convSalted))
                val sig = Scram.hmac(convMech, stored,
                  convAuthMessage.getBytes("UTF-8"))
                val pass = proof.length == sig.length && {
                  val ck = proof.indices.map(i => (proof(i) ^ sig(i)).toByte).toArray
                  java.util.Arrays.equals(Scram.h(convMech, ck), stored)
                }
                if (!pass) fail("Authentication failed")
                else {
                  authed = true; saslOk = true
                  val v = Scram.serverSignature(convMech, convSalted, convAuthMessage)
                  writeFrame(out, new Writer().i32(correlationId).i16(0).i16(-1)
                    .bytes(s"v=${java.util.Base64.getEncoder.encodeToString(v)}"
                      .getBytes("UTF-8")).result())
                }
              }
            }
          case (0 | 1) if !authed =>
            // a real broker kills the connection on pre-auth data APIs
            open = false
          case 0 =>
            require(apiVersion == 2 || apiVersion == 3,
              s"stub broker: produce v2/v3 only (got $apiVersion)")
            if (apiVersion == 3) { // nullable transactional_id
              val n = r.i16(); require(n == -1, "stub broker: transactions unsupported")
            }
            writeFrame(out, produceReply(r, correlationId))
          case 1 =>
            require(apiVersion == 2 || apiVersion == 4,
              s"stub broker: fetch v2/v4 only (got $apiVersion)")
            writeFrame(out, fetchReply(r, correlationId, apiVersion))
          case other => sys.error(s"stub broker: unsupported api key $other")
        }
      }
    }
  }

  private def produceReply(r: Reader, correlationId: Int): Array[Byte] = {
    r.i16() // acks
    r.i32() // timeout
    val nTopics = r.i32()
    val w = new Writer().i32(correlationId).i32(nTopics)
    (0 until nTopics).foreach { _ =>
      val topic = r.str()
      val nParts = r.i32()
      w.str(topic).i32(nParts)
      (0 until nParts).foreach { _ =>
        val partition = r.i32()
        val recordSet = r.bytes()
        val (err, baseOffset) =
          try {
            val msgs = parseMessageSet(recordSet)
            val buf = log.computeIfAbsent((topic, partition),
              _ => scala.collection.mutable.ArrayBuffer.empty)
            // concurrent producers to one partition append atomically,
            // like a broker's log lock
            buf.synchronized {
              val base = buf.size.toLong
              buf ++= msgs.map { case (_, k, v) => (k, v) }
              (0, base)
            }
          } catch { case _: IllegalArgumentException => (2, -1L) } // CORRUPT_MESSAGE
        w.i32(partition).i16(err).i64(baseOffset).i64(-1L)
      }
    }
    w.i32(0) // throttle
    w.result()
  }

  private def fetchReply(r: Reader, correlationId: Int,
      apiVersion: Int = 2): Array[Byte] = {
    r.i32() // replica id
    r.i32() // max wait (stub answers immediately)
    r.i32() // min bytes
    if (apiVersion >= 4) {
      r.i32() // request-level max_bytes
      val iso = r.i8()
      require(iso == 0, s"stub broker: read_committed unsupported (iso $iso)")
    }
    val nTopics = r.i32()
    val w = new Writer().i32(correlationId).i32(0) // throttle
    w.i32(nTopics)
    (0 until nTopics).foreach { _ =>
      val topic = r.str()
      val nParts = r.i32()
      w.str(topic).i32(nParts)
      (0 until nParts).foreach { _ =>
        val partition = r.i32()
        val offset = r.i64()
        val maxBytes = r.i32()
        val buf = Option(log.get((topic, partition)))
          .getOrElse(scala.collection.mutable.ArrayBuffer.empty)
        val hw = buf.size.toLong
        val slice = buf.zipWithIndex.drop(offset.toInt)
          .map { case ((k, v), i) => (i.toLong, k, v) }.toSeq
        val set =
          if (slice.isEmpty) Array.emptyByteArray
          else if (serveV2Batches) recordBatchAt(slice, 1700000000000L, v2Codec)
          else messageSetAt(slice, 1700000000000L)
        // honor max_bytes like a broker: truncate mid-message if needed
        val capped = if (set.length > maxBytes) set.take(maxBytes) else set
        w.i32(partition).i16(0).i64(hw)
        if (apiVersion >= 4) w.i64(hw).i32(-1) // last_stable, no aborted txns
        w.bytes(capped)
      }
    }
    w.result()
  }
  thread.setDaemon(true)
  thread.start()
  def close(): Unit = server.close()
}

class KafkaWireSpec extends AnyFunSuite {

  test("KafkaWireBatchSink ships a CDC batch to the broker: v2.0 frames, per-key partition order") {
    val spark = graft.core.Engine.local("kafka-wire-sink", cores = 2)
    import spark.implicits._
    val broker = new StubKafkaBroker
    try {
      val sink = new KafkaWireBatchSink("127.0.0.1", broker.port,
        numPartitions = 2, topic = "t-orders", pkCols = Seq("id"))
      val b0 = Seq(
        (1L, "insert", "db0", "orders", 1L, "a"),
        (2L, "update", "db0", "orders", 1L, "a2"),
        (3L, "insert", "db0", "orders", 2L, "b"))
        .toDF("seq", "op", "database", "table", "id", "v")
      sink.write(0L, b0)
      val b1 = Seq((4L, "update", "db0", "orders", 1L, "a3"))
        .toDF("seq", "op", "database", "table", "id", "v")
      sink.write(1L, b1)
      import scala.jdk.CollectionConverters._
      val all = broker.log.asScala.toSeq.flatMap { case ((_, p), buf) =>
        buf.toSeq.map { case (k, v) =>
          (p, new String(k, "UTF-8"), new String(v, "UTF-8")) }
      }
      assert(all.size == 4)
      assert(all.forall(_._3.contains("\"version\":\"2.0.alpha\"")))
      // all of key 1's changes share one partition, in seq order
      val k1 = all.filter(_._3.contains("\"id\":1"))
      assert(k1.map(_._1).distinct.size == 1, "key 1 must be partition-sticky")
      assert(k1.map(_._3).map(v => "\"v\":\"(a[0-9]*)\"".r
        .findFirstMatchIn(v).get.group(1)) == Seq("a", "a2", "a3"))
      // the produce must have run on EXECUTOR tasks, not the driver:
      // every connection's client id carries a task partition id stamp
      import scala.jdk.CollectionConverters._
      val ids = broker.clientIds.asScala.toSet
      assert(ids.nonEmpty && ids.forall(_.startsWith("graft-exec-")),
        s"produce must run inside executor tasks, saw client ids $ids")
    } finally { broker.close() }
  }

  test("a backfill-sized batch ships from executors in bounded request chunks, per-key order intact") {
    val spark = graft.core.Engine.local("kafka-wire-bulk", cores = 4)
    import spark.implicits._
    val broker = new StubKafkaBroker
    try {
      // small chunk cap -> many produce requests per partition; the
      // broker CRC-validates every one and order must still hold
      val sink = new KafkaWireBatchSink("127.0.0.1", broker.port,
        numPartitions = 4, topic = "t-bulk", pkCols = Seq("id"),
        maxRecordsPerRequest = 64)
      val rows = (1 to 5000).map { i =>
        (i.toLong, "insert", "db0", "t", (i % 500).toLong, s"v$i")
      }
      sink.write(0L, rows.toDF("seq", "op", "database", "table", "id", "v"))
      import scala.jdk.CollectionConverters._
      val all = broker.log.asScala.toSeq.flatMap { case ((_, p), buf) =>
        buf.toSeq.map { case (k, v) =>
          (p, new String(k, "UTF-8"), new String(v, "UTF-8")) }
      }
      assert(all.size == 5000, "every record must be acked and logged")
      // each key maps to exactly one partition, and within it the key's
      // records appear in seq order (seq == the v payload's number)
      val byKey = all.groupBy(_._2)
      assert(byKey.size == 500)
      byKey.foreach { case (_, recs) =>
        assert(recs.map(_._1).distinct.size == 1, "key must be partition-sticky")
      }
      // per-partition log order: for every key, the v-numbers ascend
      broker.log.asScala.foreach { case (_, buf) =>
        val seqsByKey = buf.toSeq
          .map { case (k, v) => (new String(k, "UTF-8"),
            "\"v\":\"v([0-9]+)\"".r.findFirstMatchIn(new String(v, "UTF-8")).get.group(1).toInt) }
          .groupBy(_._1).values
        seqsByKey.foreach { s =>
          val nums = s.map(_._2)
          assert(nums == nums.sorted, "per-key order must survive chunked produce")
        }
      }
      assert(broker.clientIds.asScala.forall(_.startsWith("graft-exec-")))
    } finally broker.close()
  }

  test("message set v1 round-trips with valid CRCs; corruption is detected") {
    val records = Seq(
      ("k1".getBytes("UTF-8"), "v1".getBytes("UTF-8")),
      (null, "tombstone-less".getBytes("UTF-8")),
      ("k3".getBytes("UTF-8"), null))
    val set = messageSet(records, 1700000000000L)
    val parsed = parseMessageSet(set)
    assert(parsed.size == 3)
    assert(new String(parsed.head._2, "UTF-8") == "k1" &&
      new String(parsed.head._3, "UTF-8") == "v1")
    assert(parsed(1)._2 == null && parsed(2)._3 == null)
    // flip one payload byte: the CRC check must catch it
    val corrupt = set.clone()
    corrupt(corrupt.length - 3) = (corrupt(corrupt.length - 3) ^ 0x01).toByte
    intercept[IllegalArgumentException](parseMessageSet(corrupt))
  }

  test("produce session against the stub broker: acks, offsets advance, per-key order kept") {
    val broker = new StubKafkaBroker
    try {
      val p = new KafkaWireProducer("127.0.0.1", broker.port, clientId = "graft-test")
      p.connect()
      def rec(k: String, v: String) = (k.getBytes("UTF-8"), v.getBytes("UTF-8"))
      val off0 = p.produce("t-orders", 0, Seq(rec("1", "a"), rec("2", "b")))
      val off1 = p.produce("t-orders", 0, Seq(rec("1", "a2")))
      val offOther = p.produce("t-orders", 1, Seq(rec("3", "c")))
      p.close()
      assert(off0 == 0L && off1 == 2L, "broker-assigned base offsets must advance")
      assert(offOther == 0L, "partitions have independent logs")
      assert(broker.lastClientId == "graft-test")
      val part0 = broker.log.get(("t-orders", 0)).toVector
        .map { case (k, v) => (new String(k, "UTF-8"), new String(v, "UTF-8")) }
      // per-key total order across produce calls (the sink's pk-sticky
      // partitioning + acked batches give cross-batch order)
      assert(part0 == Vector(("1", "a"), ("2", "b"), ("1", "a2")))
    } finally broker.close()
  }

  test("a corrupt record set surfaces as the broker's CORRUPT_MESSAGE, not a silent ack") {
    val broker = new StubKafkaBroker
    try {
      // bypass the producer's encoder: hand the broker a message set with
      // a broken CRC over a raw socket and read the response back
      val set = messageSet(Seq(("k".getBytes("UTF-8"), "v".getBytes("UTF-8"))), 0L)
      set(set.length - 1) = (set(set.length - 1) ^ 0x01).toByte
      val sock = new java.net.Socket("127.0.0.1", broker.port)
      try {
        val out = new java.io.BufferedOutputStream(sock.getOutputStream)
        val in = new java.io.BufferedInputStream(sock.getInputStream)
        writeFrame(out, produceRequest(1, "raw", "t", 0, set))
        val (_, results) = parseProduceResponse(readFrame(in))
        assert(results.head.errorCode == 2, "broker must reject the corrupt batch")
        assert(results.head.baseOffset == -1L)
        assert(!broker.log.containsKey(("t", 0)), "nothing may be appended")
      } finally sock.close()
    } finally broker.close()
  }

  test("wire consumer fetches back what the producer shipped, from any offset") {
    val broker = new StubKafkaBroker
    try {
      val producer = new KafkaWire.KafkaWireProducer("127.0.0.1", broker.port).connect()
      val records = (0 until 5).map(i =>
        (s"k$i".getBytes("UTF-8"), s"v$i".getBytes("UTF-8")))
      producer.produce("t", 0, records, timestampMs = 1700000000000L)
      producer.close()
      val consumer = new KafkaWire.KafkaWireConsumer("127.0.0.1", broker.port).connect()
      val (hw, got) = consumer.poll("t", 0, 0L)
      assert(hw == 5L)
      assert(got.map { case (o, k, v) =>
        (o, new String(k, "UTF-8"), new String(v, "UTF-8")) } ==
        (0 until 5).map(i => (i.toLong, s"k$i", s"v$i")))
      // resume mid-log: only offsets >= 3
      val (hw2, tail) = consumer.poll("t", 0, 3L)
      assert(hw2 == 5L && tail.map(_._1) == Seq(3L, 4L))
      // caught up: empty records, hw unchanged
      val (hw3, empty) = consumer.poll("t", 0, 5L)
      assert(hw3 == 5L && empty.isEmpty)
      consumer.close()
    } finally broker.close()
  }

  test("poll enforces maxWaitMs < readTimeoutMs at the call site") {
    val broker = new StubKafkaBroker
    try {
      val consumer = new KafkaWire.KafkaWireConsumer("127.0.0.1", broker.port,
        readTimeoutMs = 1000).connect()
      // a wait at or beyond the socket timeout would turn a quiet,
      // caught-up topic into spurious SocketTimeoutExceptions — the
      // invariant must fail loudly, not be documentation
      val e = intercept[IllegalArgumentException](
        consumer.poll("t", 0, 0L, maxWaitMs = 1000))
      assert(e.getMessage.contains("readTimeoutMs"), e.getMessage)
      consumer.close()
    } finally broker.close()
  }

  test("SASL/SCRAM listener: produce+fetch after mutual auth, pre-auth connections killed") {
    val broker = new StubKafkaBroker(
      saslAuth = Some(("svc-cdc", "s3cret", "SCRAM-SHA-256")))
    try {
      // unauthenticated produce: the broker kills the connection
      val anon = new KafkaWire.KafkaWireProducer("127.0.0.1", broker.port).connect()
      intercept[java.io.IOException](anon.produce("t", 0,
        Seq(("k".getBytes("UTF-8"), "v".getBytes("UTF-8"))), 1700000000000L))
      anon.close()
      assert(!broker.saslOk)
      // authenticated produce + fetch round-trip
      val producer = new KafkaWire.KafkaWireProducer("127.0.0.1", broker.port,
        sasl = Some(("svc-cdc", "s3cret", "SCRAM-SHA-256"))).connect()
      assert(broker.saslOk, "broker must verify the client proof server-side")
      producer.produce("t", 0, (0 until 3).map(i =>
        (s"k$i".getBytes("UTF-8"), s"v$i".getBytes("UTF-8"))), 1700000000000L)
      producer.close()
      val consumer = new KafkaWire.KafkaWireConsumer("127.0.0.1", broker.port,
        sasl = Some(("svc-cdc", "s3cret", "SCRAM-SHA-256"))).connect()
      val (hw, got) = consumer.poll("t", 0, 0L)
      consumer.close()
      assert(hw == 3L && got.map(t => new String(t._3, "UTF-8")) == Seq("v0", "v1", "v2"))
    } finally broker.close()
  }

  test("SASL wrong password and unsupported mechanism are loud refusals") {
    val broker = new StubKafkaBroker(
      saslAuth = Some(("svc-cdc", "s3cret", "SCRAM-SHA-256")))
    try {
      val bad = new KafkaWire.KafkaWireProducer("127.0.0.1", broker.port,
        sasl = Some(("svc-cdc", "WRONG", "SCRAM-SHA-256")))
      val e = intercept[IllegalArgumentException](bad.connect())
      assert(e.getMessage.contains("Authentication failed"))
      assert(!broker.saslOk)
      val wrongMech = new KafkaWire.KafkaWireProducer("127.0.0.1", broker.port,
        sasl = Some(("svc-cdc", "s3cret", "SCRAM-SHA-512")))
      val e2 = intercept[IllegalArgumentException](wrongMech.connect())
      assert(e2.getMessage.contains("refused SASL mechanism"))
      assert(e2.getMessage.contains("SCRAM-SHA-256"), "refusal lists enabled mechanisms")
    } finally broker.close()
  }

  test("produce v3 ships RecordBatch v2 — the only form a 4.x broker accepts") {
    val broker = new StubKafkaBroker(serveV2Batches = true)
    try {
      val producer = new KafkaWire.KafkaWireProducer("127.0.0.1", broker.port,
        batchMagic = 2).connect()
      val base = producer.produce("t4", 0, (0 until 3).map(i =>
        (s"k$i".getBytes("UTF-8"), s"v$i".getBytes("UTF-8"))),
        timestampMs = 1700000000000L)
      assert(base == 0L)
      // appended again: offsets continue
      assert(producer.produce("t4", 0,
        Seq(("k9".getBytes("UTF-8"), "v9".getBytes("UTF-8"))),
        timestampMs = 1700000000000L) == 3L)
      producer.close()
      val consumer = new KafkaWire.KafkaWireConsumer("127.0.0.1", broker.port).connect()
      val (hw, got) = consumer.poll("t4", 0, 0L)
      consumer.close()
      assert(hw == 4L)
      assert(got.map { case (o, k, v) =>
        (o, new String(k, "UTF-8"), new String(v, "UTF-8")) } ==
        Seq((0L, "k0", "v0"), (1L, "k1", "v1"), (2L, "k2", "v2"), (3L, "k9", "v9")))
    } finally broker.close()
  }

  test("RecordBatch v2 round-trips through every codec, CRC32C validated") {
    import KafkaWire._
    val records = Seq(
      (39L, "k1".getBytes("UTF-8"), "v1".getBytes("UTF-8")),
      (40L, null: Array[Byte], "v2".getBytes("UTF-8")), // null key is legal
      (41L, "k3".getBytes("UTF-8"), "v3".getBytes("UTF-8")))
    Seq(0, 1, 2, 3, 4).foreach { codec => // none, gzip, snappy, lz4, zstd
      val batch = recordBatchAt(records, 1700000000123L, codec)
      val got = parseMessageSet(batch)
      assert(got.map(_._1) == Seq(39L, 40L, 41L), s"codec $codec offsets")
      assert(got.map(t => new String(t._3, "UTF-8")) == Seq("v1", "v2", "v3"))
      assert(got(1)._2 == null)
    }
    // a flipped payload byte must fail the CRC32C loudly
    val batch = recordBatchAt(records, 1700000000123L)
    batch(batch.length - 1) = (batch(batch.length - 1) ^ 0x01).toByte
    val e = intercept[IllegalArgumentException](parseMessageSet(batch))
    assert(e.getMessage.contains("CRC32C"))
  }

  test("v2 control batches are skipped; v1 sets and v2 batches coexist in one fetch") {
    import KafkaWire._
    val data = recordBatchAt(Seq(
      (10L, "a".getBytes("UTF-8"), "x".getBytes("UTF-8")),
      (11L, "b".getBytes("UTF-8"), "y".getBytes("UTF-8"))), 1700000000123L)
    // a transaction commit marker rides a CONTROL batch — metadata, not data
    val marker = recordBatchAt(Seq(
      (12L, Array[Byte](0, 0, 0, 1), Array.emptyByteArray)),
      1700000000123L, control = true)
    val v1 = messageSetAt(Seq(
      (13L, "c".getBytes("UTF-8"), "z".getBytes("UTF-8"))), 1700000000123L)
    val got = parseMessageSet(data ++ marker ++ v1)
    assert(got.map(_._1) == Seq(10L, 11L, 13L), "control offset 12 skipped")
    assert(got.map(t => new String(t._3, "UTF-8")) == Seq("x", "y", "z"))
  }

  test("wire consumer reads a broker serving v2 batches (zstd) unchanged") {
    val broker = new StubKafkaBroker(serveV2Batches = true, v2Codec = 4)
    try {
      val producer = new KafkaWire.KafkaWireProducer("127.0.0.1", broker.port).connect()
      val records = (0 until 5).map(i =>
        (s"k$i".getBytes("UTF-8"), s"v$i".getBytes("UTF-8")))
      producer.produce("t", 0, records, timestampMs = 1700000000000L)
      producer.close()
      val consumer = new KafkaWire.KafkaWireConsumer("127.0.0.1", broker.port).connect()
      val (hw, got) = consumer.poll("t", 0, 0L)
      assert(hw == 5L)
      assert(got.map { case (o, k, v) =>
        (o, new String(k, "UTF-8"), new String(v, "UTF-8")) } ==
        (0 until 5).map(i => (i.toLong, s"k$i", s"v$i")))
      val (hw2, tail) = consumer.poll("t", 0, 3L)
      assert(hw2 == 5L && tail.map(_._1) == Seq(3L, 4L))
      consumer.close()
      // the full 4.x dialect: fetch v4 parses the transactional
      // partition header (last_stable_offset, null aborted set) around
      // the same batches
      val modern = new KafkaWire.KafkaWireConsumer("127.0.0.1", broker.port,
        fetchVersion = 4).connect()
      val (hw4, got4) = modern.poll("t", 0, 0L)
      assert(hw4 == 5L && got4.map(_._1) == (0L until 5L))
      modern.close()
    } finally broker.close()
  }

  test("gzip, snappy and lz4 wrapper sets decode with correct absolute offsets") {
    import KafkaWire._
    val records = Seq(
      (39L, "k1".getBytes("UTF-8"), "v1".getBytes("UTF-8")),
      (40L, "k2".getBytes("UTF-8"), "v2".getBytes("UTF-8")),
      (41L, "k3".getBytes("UTF-8"), "v3".getBytes("UTF-8")))
    Seq(1, 2, 3).foreach { codec => // gzip, snappy, lz4 frame (KIP-57)
      val set = compressedMessageSet(codec, records, 1700000000123L)
      val got = parseMessageSet(set)
      // KIP-31: wrapper offset 41 + relative 0..2 -> absolutes 39..41
      assert(got.map(_._1) == Seq(39L, 40L, 41L), s"codec $codec offsets")
      assert(got.map(t => new String(t._3, "UTF-8")) == Seq("v1", "v2", "v3"))
    }
    // a compressed wrapper can ride alongside plain messages in one set
    val mixed = messageSetAt(Seq((42L, "k4".getBytes("UTF-8"),
      "v4".getBytes("UTF-8"))), 1700000000123L)
    val both = compressedMessageSet(1, records, 1700000000123L) ++ mixed
    assert(parseMessageSet(both).map(_._1) == Seq(39L, 40L, 41L, 42L))
  }

  test("unsupported codecs and corrupt compressed blobs are refused loudly") {
    import KafkaWire._
    // zstd (codec 4) is v2-record-batch-only — refusal, never a raw record
    def wrapper(codec: Int, blob: Array[Byte]): Array[Byte] = {
      val body = new Writer()
        .i8(1).i8(codec).i64(1700000000123L)
        .bytes("k".getBytes("UTF-8")).bytes(blob)
        .result()
      val crc = new java.util.zip.CRC32
      crc.update(body)
      new Writer().i64(0L).i32(body.length + 4)
        .i32(crc.getValue.toInt).raw(body).result()
    }
    val e = intercept[IllegalArgumentException](
      parseMessageSet(wrapper(4, "zstd-blob".getBytes("UTF-8"))))
    assert(e.getMessage.contains("codec 4"))
    // corrupt lz4 frame header: loud refusal, not an empty decode
    val e3 = intercept[IllegalArgumentException](
      parseMessageSet(wrapper(3, "not-lz4!".getBytes("UTF-8"))))
    assert(e3.getMessage.contains("corrupt compressed"))
    // valid CRC around an invalid gzip payload must be a loud protocol
    // error, not an empty decode
    val e2 = intercept[IllegalArgumentException](
      parseMessageSet(wrapper(1, "not-gzip".getBytes("UTF-8"))))
    assert(e2.getMessage.contains("corrupt compressed"))
  }

  test("a fetch truncated at max_bytes mid-message is tolerated, produce validation stays strict") {
    // build a set of two messages and cut it mid-second-message
    val set = KafkaWire.messageSetAt(Seq(
      (0L, "a".getBytes, "aaaa".getBytes), (1L, "b".getBytes, "bbbb".getBytes)),
      1700000000000L)
    val cut = set.take(set.length - 3)
    val lenient = KafkaWire.parseMessageSet(cut, tolerateTruncation = true)
    assert(lenient.map(_._1) == Seq(0L), "only the complete first message survives")
    intercept[Exception](KafkaWire.parseMessageSet(cut))
  }
}
