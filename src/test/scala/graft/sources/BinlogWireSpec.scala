package graft.sources

import graft.sources.BinlogWire._
import org.scalatest.funsuite.AnyFunSuite

/** The replication wire protocol against hand-derived golden bytes and a
  * live stub master speaking the server side of the protocol.
  */
class BinlogWireSpec extends AnyFunSuite {

  private def unhex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  // hand-derived from the binlog v4 spec (struct-packed independently of
  // the Scala writer): TABLE_MAP db1.t (LONG id, VARCHAR(40) name
  // nullable) then WRITE_ROWS_V2 rows (7,'alice') and (8, NULL)
  private val goldenTableMap =
    "00f1536513630000002a000000e803000000002a00000000000100036462310001740002030f02280002"
  private val goldenWriteRows =
    "00f153651e630000002f000000b004000000002a0000000000010002000203000700000005616c6963650208000000"

  test("golden TABLE_MAP + WRITE_ROWS_V2 bytes decode to the reference-shaped events") {
    val maps = scala.collection.mutable.Map.empty[Long, TableMap]
    val tm = parseEvent(unhex(goldenTableMap), maps).asInstanceOf[TableMap]
    assert(tm.tableId == 42L && tm.database == "db1" && tm.table == "t")
    assert(tm.columnTypes.toSeq == Seq(3, 15) && tm.columnMeta.toSeq == Seq(0, 40))
    assert(tm.nullable.toSeq == Seq(false, true))
    assert(tm.header.timestamp == 1700000000L && tm.header.serverId == 99L)
    val wr = parseEvent(unhex(goldenWriteRows), maps).asInstanceOf[Rows]
    assert(wr.op == "insert" && wr.tableId == 42L)
    assert(wr.rows == Seq(
      (None, IndexedSeq(7, "alice")),
      (None, IndexedSeq(8, null))))
  }

  test("mysql_native_password produces the documented SHA1 xor") {
    val scramble = (1 to 20).map(_.toByte).toArray
    val auth = nativePassword("secret", scramble)
    // independent recomputation straight from the definition
    val sha1 = java.security.MessageDigest.getInstance("SHA-1")
    val p1 = sha1.digest("secret".getBytes("UTF-8"))
    sha1.reset(); val p2 = sha1.digest(p1)
    sha1.reset(); sha1.update(scramble ++ p2)
    val mix = sha1.digest()
    assert(auth.toSeq == p1.zip(mix).map { case (a, b) => (a ^ b).toByte }.toSeq)
    assert(auth.length == 20)
    assert(nativePassword("", scramble).isEmpty)
  }

  test("full replication session against the stub master: auth, checksum pin, event stream, typed rows") {
    val cols = Seq((3, 0, false), (15, 40, true)) // LONG id, VARCHAR(40) name
    val colMeta = cols.map { case (t, m, _) => (t, m) }
    val events = Seq(
      StubBinlog.fde(),
      StubBinlog.rotate("mysql-bin.000007", 4L),
      StubBinlog.query("db1", "BEGIN"),
      StubBinlog.tableMap(42L, "db1", "t", cols),
      StubBinlog.writeRows(42L, colMeta, Seq(Seq(7, "alice"), Seq(8, null))),
      StubBinlog.updateRows(42L, colMeta, Seq((Seq(7, "alice"), Seq(7, "bob")))),
      StubBinlog.deleteRows(42L, colMeta, Seq(Seq(8, null))),
      // system-schema traffic the tailer must skip (binlog_tailer.go:268)
      StubBinlog.tableMap(43L, "mysql", "user", cols),
      StubBinlog.writeRows(43L, colMeta, Seq(Seq(1, "root"))),
      StubBinlog.xid(777L))
    val srv = new StubMySqlServer("repl", "replpass", events)
    try {
      val client = new BinlogClient("127.0.0.1", srv.port, "repl", "replpass",
        slaveServerId = 4242L)
      client.connect()
      assert(client.serverVersion == "8.0.0-stub")
      assert(srv.authOk, "server must verify the scrambled password")
      assert(srv.sawChecksumPin, "client must pin @master_binlog_checksum")
      val got = client.dump("mysql-bin.000007", 4L).toVector
      client.close()
      assert(srv.dumpFile == "mysql-bin.000007" && srv.dumpPos == 4L)
      assert(got.collect { case f: FormatDescription => f.binlogVersion } == Vector(4))
      assert(got.collect { case r: Rotate => (r.nextFile, r.position) } ==
        Vector(("mysql-bin.000007", 4L)))
      assert(got.collect { case q: Query => q.sql } == Vector("BEGIN"))
      assert(got.collect { case x: Xid => x.xid } == Vector(777L))
      val rows = got.collect { case r: Rows => r }
      assert(rows.map(_.op) == Vector("insert", "update", "delete", "insert"))
      assert(rows(0).rows == Seq(
        (None, IndexedSeq(7, "alice")), (None, IndexedSeq(8, null))))
      assert(rows(1).rows == Seq(
        (Some(IndexedSeq(7, "alice")), IndexedSeq(7, "bob"))))
      assert(rows(2).rows == Seq((None, IndexedSeq(8, null))))
      // envelope conversion: per-row change records, mysql schema skipped
      val change = changeRows(got.iterator).toVector
      assert(change.map(c => (c.op, c.database, c.table)).distinct ==
        Vector(("insert", "db1", "t"), ("update", "db1", "t"), ("delete", "db1", "t")))
      assert(change.count(_.database == "mysql") == 0)
      val upd = change.find(_.op == "update").get
      assert(upd.before.contains(IndexedSeq(7, "alice")) &&
        upd.values == IndexedSeq(7, "bob"))
    } finally srv.close()
  }

  test("tailed events land in the enveloped frame and flow through the filter chain") {
    val spark = graft.core.Engine.local("binlog-frame", cores = 2)
    val cols = Seq((3, 0, false), (15, 40, true))
    val colMeta = cols.map { case (t, m, _) => (t, m) }
    val events = Seq(
      StubBinlog.fde(),
      StubBinlog.tableMap(42L, "db1", "orders", cols),
      StubBinlog.writeRows(42L, colMeta, Seq(Seq(7, "alice"), Seq(8, null))),
      StubBinlog.updateRows(42L, colMeta, Seq((Seq(7, "alice"), Seq(7, "bob")))),
      StubBinlog.xid(1L))
    val srv = new StubMySqlServer("repl", "replpass", events)
    try {
      val client = new BinlogClient("127.0.0.1", srv.port, "repl", "replpass")
      client.connect()
      val change = changeRows(client.dump("mysql-bin.000001", 4L)).toVector
      client.close()
      // names from the "schema store" seat
      val env = envelopeFrame(spark, change,
        names = (_, _) => Some(Seq("id", "name")),
        pkOf = (_, _) => Seq("id"))
      import org.apache.spark.sql.functions._
      val filtered = graft.operators.RenameColumnsFilter(
        Seq("name"), Seq("customer"),
        Seq(graft.operators.SchemaMatcher("db1")), enveloped = true)(env)
      val got = filtered
        .select(col("op"), element_at(col("data"), "id").as("id"),
          element_at(col("data"), "customer").as("customer"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
      assert(got == Set(
        ("insert", "7", "alice"), ("insert", "8", null), ("update", "7", "bob")))
      // the update's before-image rides `old`, renamed too
      val old = filtered.filter(col("op") === "update")
        .select(element_at(col("old"), "customer")).head.getString(0)
      assert(old == "alice")
      // pk identity from the before image on updates
      val pk = filtered.filter(col("op") === "update")
        .select(element_at(col("pks"), "id")).head.getString(0)
      assert(pk == "7")
    } finally srv.close()
  }

  test("wrong password is refused by the scramble check and surfaces as a server error") {
    val srv = new StubMySqlServer("repl", "replpass", Seq.empty)
    try {
      val client = new BinlogClient("127.0.0.1", srv.port, "repl", "WRONG")
      val e = intercept[ServerError](client.connect())
      assert(e.errno == 1045)
      assert(!srv.authOk)
    } finally srv.close()
  }

  test("caching_sha2_password produces the documented SHA256 xor") {
    val scramble = (1 to 20).map(_.toByte).toArray
    val auth = sha256Password("secret", scramble)
    // independent recomputation straight from the definition:
    // XOR(SHA256(pwd), SHA256(SHA256(SHA256(pwd)) + nonce))
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val p1 = md.digest("secret".getBytes("UTF-8"))
    md.reset(); val p2 = md.digest(p1)
    md.reset(); val mix = md.digest(p2 ++ scramble)
    assert(auth.toSeq == p1.zip(mix).map { case (a, b) => (a ^ b).toByte }.toSeq)
    assert(auth.length == 32)
    assert(sha256Password("", scramble).isEmpty)
  }

  test("caching_sha2 fast path: scramble verified server-side, dump proceeds") {
    val events = Seq(StubBinlog.fde(), StubBinlog.xid(7L))
    val srv = new StubMySqlServer("repl", "replpass", events, authMode = "sha2-fast")
    try {
      val client = new BinlogClient("127.0.0.1", srv.port, "repl", "replpass")
      client.connect()
      assert(srv.authOk, "server must verify the SHA256 scramble")
      val got = client.dump("mysql-bin.000001", 4L).toVector
      client.close()
      assert(got.collect { case x: Xid => x.xid } == Vector(7L))
    } finally srv.close()
  }

  test("caching_sha2 full auth: RSA public-key exchange recovers the password server-side") {
    val events = Seq(StubBinlog.fde(), StubBinlog.xid(8L))
    val srv = new StubMySqlServer("repl", "replpass", events, authMode = "sha2-full")
    try {
      val client = new BinlogClient("127.0.0.1", srv.port, "repl", "replpass")
      client.connect()
      assert(srv.authOk,
        "server must decrypt the OAEP blob and recover password+NUL")
      val got = client.dump("mysql-bin.000001", 4L).toVector
      client.close()
      assert(got.collect { case x: Xid => x.xid } == Vector(8L))
    } finally srv.close()
  }

  test("caching_sha2 wrong password fails the scramble before any RSA round-trip") {
    val srv = new StubMySqlServer("repl", "replpass", Seq.empty, authMode = "sha2-full")
    try {
      val client = new BinlogClient("127.0.0.1", srv.port, "repl", "WRONG")
      val e = intercept[ServerError](client.connect())
      assert(e.errno == 1045)
      assert(!srv.authOk)
    } finally srv.close()
  }

  test("AuthSwitchRequest back to native re-scrambles against the FRESH nonce") {
    val events = Seq(StubBinlog.fde(), StubBinlog.xid(9L))
    val srv = new StubMySqlServer("repl", "replpass", events, authMode = "switch-native")
    try {
      val client = new BinlogClient("127.0.0.1", srv.port, "repl", "replpass")
      client.connect()
      assert(srv.authOk, "server must verify the native scramble on the switch nonce")
      val got = client.dump("mysql-bin.000001", 4L).toVector
      client.close()
      assert(got.collect { case x: Xid => x.xid } == Vector(9L))
    } finally srv.close()
  }

  test("a binlog_checksum=CRC32 master's trailers are validated and stripped") {
    val cols = Seq((3, 0, false), (15, 40, true))
    val colMeta = cols.map { case (t, m, _) => (t, m) }
    val events = Seq(
      StubBinlog.fde(),
      StubBinlog.tableMap(42L, "db1", "t", cols),
      StubBinlog.writeRows(42L, colMeta, Seq(Seq(7, "alice"))),
      StubBinlog.xid(1L))
    val srv = new StubMySqlServer("repl", "replpass", events,
      binlogChecksum = "CRC32")
    try {
      val client = new BinlogClient("127.0.0.1", srv.port, "repl", "replpass")
      client.connect()
      val got = client.dump("mysql-bin.000001", 4L).toVector
      client.close()
      // the stripped events decode exactly like a NONE-mode stream
      assert(got.collect { case f: FormatDescription => f.binlogVersion } == Vector(4))
      val rows = got.collect { case r: Rows => r }
      assert(rows.map(_.op) == Vector("insert"))
      assert(rows(0).rows == Seq((None, IndexedSeq(7, "alice"))))
      assert(got.collect { case x: Xid => x.xid } == Vector(1L))
    } finally srv.close()
  }

  test("the artificial rotate a CRC32 master sends BEFORE the FDE is stripped clean") {
    // real dump streams open with an artificial ROTATE (already
    // checksummed) and only THEN the FDE that announces the algorithm
    val raw = Seq(
      StubBinlog.rotate("mysql-bin.000009", 4L),
      StubBinlog.fde(),
      StubBinlog.xid(5L))
    val srv = new StubMySqlServer("repl", "replpass", raw,
      binlogChecksum = "CRC32")
    try {
      val client = new BinlogClient("127.0.0.1", srv.port, "repl", "replpass")
      client.connect()
      val got = client.dump("mysql-bin.000009", 4L).toVector
      client.close()
      // without the pre-FDE strip the filename would carry 4 junk bytes
      assert(got.collect { case r: Rotate => r.nextFile } ==
        Vector("mysql-bin.000009"))
      assert(got.collect { case x: Xid => x.xid } == Vector(5L))
    } finally srv.close()
  }

  test("a corrupt CRC32 trailer fails loudly instead of decoding garbage") {
    val events = Seq(StubBinlog.fde(), StubBinlog.xid(2L))
    val srv = new StubMySqlServer("repl", "replpass", events,
      binlogChecksum = "CRC32-tamper")
    try {
      val client = new BinlogClient("127.0.0.1", srv.port, "repl", "replpass")
      client.connect()
      val e = intercept[IllegalArgumentException](
        client.dump("mysql-bin.000001", 4L).toVector)
      assert(e.getMessage.contains("CRC32 mismatch"))
      client.close()
    } finally srv.close()
  }

  test("heartbeat keepalives are consumed silently, in both checksum modes") {
    Seq("NONE", "CRC32").foreach { mode =>
      val events = Seq(
        StubBinlog.fde(),
        StubBinlog.heartbeat("mysql-bin.000001"), // idle master keepalive
        StubBinlog.xid(3L),
        StubBinlog.heartbeat("mysql-bin.000001"))
      val srv = new StubMySqlServer("repl", "replpass", events,
        binlogChecksum = mode)
      try {
        val client = new BinlogClient("127.0.0.1", srv.port, "repl", "replpass")
        client.connect()
        val got = client.dump("mysql-bin.000001", 4L).toVector
        client.close()
        assert(got.size == 2, s"mode $mode: heartbeats must not surface")
        assert(got.collect { case x: Xid => x.xid } == Vector(3L), s"mode $mode")
      } finally srv.close()
    }
  }

  test("an unknown auth plugin is refused with the actionable message") {
    // hand-build a handshake advertising an unsupported plugin
    val payload = new ByteWriter()
      .u8(10).strNul("8.0.0-x").u32(1L)
      .bytes((1 to 8).map(_.toByte).toArray).u8(0)
      .u16((CapProtocol41 | CapSecureConnection).toInt & 0xffff)
      .u8(33).u16(2)
      .u16((((CapProtocol41 | CapSecureConnection | CapPluginAuth) >> 16) & 0xffff).toInt)
      .u8(21).bytes(new Array[Byte](10))
      .bytes((9 to 20).map(_.toByte).toArray).u8(0)
      .strNul("authentication_ldap_simple")
      .result()
    val server = new java.net.ServerSocket(0, 1,
      java.net.InetAddress.getLoopbackAddress)
    val t = new Thread(() => {
      try {
        val s = server.accept()
        writePacket(s.getOutputStream, 0, payload)
        s.getOutputStream.flush()
        Thread.sleep(500)
        s.close()
      } catch { case _: Exception => () }
    })
    t.setDaemon(true); t.start()
    try {
      val client = new BinlogClient("127.0.0.1", server.getLocalPort, "u", "p")
      val e = intercept[IllegalArgumentException](client.connect())
      assert(e.getMessage.contains("authentication_ldap_simple"))
      client.close()
    } finally server.close()
  }

  test("unsupported column types fail loudly instead of decoding garbage") {
    val maps = scala.collection.mutable.Map.empty[Long, TableMap]
    parseEvent(unhex(goldenTableMap), maps)
    // rewrite the table map to claim MYSQL_TYPE_TYPED_ARRAY (20, a
    // replication-internal type this decoder does not speak) for column 0
    val tm = maps(42L)
    maps(42L) = tm.copy(columnTypes = Array(20, 15))
    val e = intercept[UnsupportedOperationException](
      parseEvent(unhex(goldenWriteRows), maps))
    assert(e.getMessage.contains("20"))
  }

  test("binlog rotation keeps composed positions monotone (logPos resets per file)") {
    val h = EventHeader(0L, 0, 99L, 0L, 0L, 0)
    val tm = TableMap(h.copy(logPos = 400L), 42L, "db1", "t",
      Array(3), Array(0), Array(false))
    val events: Iterator[BinlogEvent] = Iterator(
      Rotate(h.copy(eventType = ROTATE_EVENT), 4L, "mysql-bin.000002"),
      tm,
      Rows(h.copy(logPos = 500L), "insert", 42L, Some(tm),
        Seq((None, IndexedSeq(1)))),
      // rotation: the next file starts over near 4
      Rotate(h.copy(eventType = ROTATE_EVENT), 4L, "mysql-bin.000003"),
      Rows(h.copy(logPos = 120L), "insert", 42L, Some(tm),
        Seq((None, IndexedSeq(2)))))
    val seqs = changeRows(events).map(_.seq).toVector
    assert(seqs == Vector(composedSeq(2L, 500L), composedSeq(3L, 120L)))
    assert(seqs == seqs.sorted && seqs.distinct.size == 2,
      "post-rotation rows must NOT sort before pre-rotation rows")
    assert(fileIndexOf("mysql-bin.000007") == 7L && fileIndexOf("nodigits") == 0L)
  }

  test("a stale schema store (wrong name count) fails loudly instead of dropping columns") {
    val row = ChangeRow(1L, "insert", "db1", "t", None, IndexedSeq(7, "x", "extra"))
    val e = intercept[IllegalArgumentException] {
      envelopeOf(row, names = (_, _) => Some(Seq("id", "name")), pkOf = (_, _) => Nil)
    }
    assert(e.getMessage.contains("2 column names") && e.getMessage.contains("3 values"))
    // correct arity renders all columns
    val ok = envelopeOf(row, names = (_, _) => Some(Seq("id", "name", "k")),
      pkOf = (_, _) => Seq("id"))
    assert(ok.data == Map("id" -> "7", "name" -> "x", "k" -> "extra") &&
      ok.pks == Map("id" -> "7"))
  }

  test("temporal + decimal column types decode against hand-derived golden bytes") {
    // values hand-packed from the public storage formats (BE family):
    // YEAR 2024; DATETIME2(2) 2023-11-15 10:30:45.25;
    // TIMESTAMP2(6) 2023-11-15T10:30:45.123456Z; TIME2(2) 838:59:58.5;
    // TIME2(2) -00:00:01.01 (borrow form); DECIMAL(10,4) ±123456.7891;
    // DECIMAL(20,6) 12345678901234.567891 (full 9-digit group + partials)
    val golden = "7c" + "99b19ea7ad19" + "65549dd501e240" + "b46efa32" +
      "7ffffeff" + "81e2401ed3" + "7e1dbfe12c" + "803039287735f208aa53"
    val cols = Seq( // (type, meta)
      (13, 0), (18, 2), (17, 6), (19, 2), (19, 2),
      (246, (10 << 8) | 4), (246, (10 << 8) | 4), (246, (20 << 8) | 6))
    val body = new ByteWriter()
      .u48(77L).u16(1).u16(2) // tableId, flags, v2 extra len
      .lenenc(cols.size.toLong)
      .u8(0xff) // present bitmap: all 8
      .u8(0x00) // null bitmap: none
      .bytes(unhex(golden))
      .result()
    val header = new ByteWriter()
      .u32(1700000000L).u8(WRITE_ROWS_V2).u32(99L)
      .u32(19L + body.length).u32(5000L).u16(0)
      .result()
    val maps = scala.collection.mutable.Map.empty[Long, TableMap]
    maps(77L) = TableMap(EventHeader(0L, TABLE_MAP_EVENT, 99L, 0L, 0L, 0),
      77L, "db1", "wide", cols.map(_._1).toArray, cols.map(_._2).toArray,
      Array.fill(cols.size)(false))
    val ev = parseEvent(header ++ body, maps).asInstanceOf[Rows]
    val row = ev.rows.head._2
    assert(row(0) == 2024)
    assert(row(1) == java.time.LocalDateTime.of(2023, 11, 15, 10, 30, 45, 250000000))
    assert(row(2) == java.time.Instant.ofEpochSecond(1700044245L, 123456000L))
    assert(row(3) == java.time.Duration.ofSeconds(838L * 3600 + 59 * 60 + 58, 500000000L))
    assert(row(4) == java.time.Duration.ofMillis(-1010L))
    assert(row(5) == new java.math.BigDecimal("123456.7891"))
    assert(row(6) == new java.math.BigDecimal("-123456.7891"))
    assert(row(7) == new java.math.BigDecimal("12345678901234.567891"))
  }

  test("table-map metadata widths parse for the temporal/decimal family") {
    // TABLE_MAP with YEAR, DATETIME2(fsp), NEWDECIMAL(precision,scale):
    // the metadata length check proves each type consumes its exact width
    val w = new ByteWriter()
      .u48(88L).u16(1)
      .u8(3).str("db1").u8(0)
      .u8(1).str("t").u8(0)
      .lenenc(4L)
      .u8(13).u8(18).u8(246).u8(19) // YEAR, DATETIME2, NEWDECIMAL, TIME2
    val meta = new ByteWriter().u8(4).u8(12).u8(6).u8(3).result() // fsp4; (12,6); fsp3
    w.lenenc(meta.length.toLong).bytes(meta)
    w.u8(0x00) // null bitmap
    val header = new ByteWriter()
      .u32(1700000000L).u8(TABLE_MAP_EVENT).u32(99L).u32(0L).u32(0L).u16(0)
      .result()
    val maps = scala.collection.mutable.Map.empty[Long, TableMap]
    val tm = parseEvent(header ++ w.result(), maps).asInstanceOf[TableMap]
    assert(tm.columnMeta.toSeq == Seq(0, 4, (12 << 8) | 6, 3))
  }

  test("GTID resume: the executed set rides COM_BINLOG_DUMP_GTID and GTID events replay into the algebra") {
    val sid = "3e11fa47-71ca-11e1-9e33-c80aa9429562"
    val sid2 = "aaaaaaaa-bbbb-cccc-dddd-eeeeeeeeeeee"
    // wire form round-trips through the codec pair (exclusive wire ends
    // vs inclusive GtidSet ends)
    val executed = GtidSet.parse(s"$sid:1-5:9,$sid2:1-3")
    assert(decodeGtidSet(encodeGtidSet(executed)) == executed)
    val cols = Seq((3, 0, false))
    val colMeta = cols.map { case (t, m, _) => (t, m) }
    val events = Seq(
      StubBinlog.fde(),
      StubBinlog.gtid(sid, 10L),
      StubBinlog.tableMap(91L, "db1", "t", cols),
      StubBinlog.writeRows(91L, colMeta, Seq(Seq(1))),
      StubBinlog.xid(1L),
      StubBinlog.gtid(sid, 11L),
      StubBinlog.writeRows(91L, colMeta, Seq(Seq(2))),
      StubBinlog.xid(2L))
    val srv = new StubMySqlServer("repl", "replpass", events)
    try {
      val client = new BinlogClient("127.0.0.1", srv.port, "repl", "replpass")
      client.connect()
      val got = client.dumpGtid(executed).toVector
      client.close()
      // the stub decoded the dumped set SERVER-side — byte-level contract
      assert(srv.dumpGtid.contains(executed))
      // streamed GTID events accumulate into the executed algebra — the
      // position value the reference checkpoints
      val advanced = got.collect { case g: Gtid => g }
        .foldLeft(executed)((acc, g) => acc.add(g.uuid, g.gno))
      assert(advanced == GtidSet.parse(s"$sid:1-5:9-11,$sid2:1-3"))
      assert(got.collect { case r: Rows => r }.size == 2)
    } finally srv.close()
  }

  test("enum/set/bit/json/geometry and pre-5.6 temporals decode from row images") {
    // ENUM and SET ride MYSQL_TYPE_STRING with the real type in the meta
    // high byte and no length prefix — the regression this test pins is
    // that they must NOT take the string path (which would misread the
    // index byte as a length)
    val cols = Seq( // (type, meta, nullable)
      (254, (247 << 8) | 1, false), // ENUM, 1-byte index
      (254, (247 << 8) | 2, false), // ENUM, 2-byte index
      (254, (248 << 8) | 2, false), // SET, 2-byte bitmask
      (16, (1 << 8) | 2, false), // BIT(10): bits/8=1, bits%8=2
      (245, 4, false), // JSON, 4 length bytes
      (7, 0, false), // pre-5.6 TIMESTAMP
      (12, 0, false), // pre-5.6 DATETIME
      (11, 0, false), // pre-5.6 TIME
      (255, 2, false)) // GEOMETRY, blob-form
    val colMeta = cols.map { case (t, m, _) => (t, m) }
    // {"a":7,"bc":"x"} — golden bytes shared with JsonBinarySpec
    val jsonb = ("00 0200 1700 1200 0100 1300 0200 05 0700 0c 1500 61 6263 01 78")
      .replaceAll("\\s+", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val wkb = Array[Byte](1, 2, 3, 4)
    val values = Seq(
      2, 300, 0x0105L, 0x2abL, jsonb,
      java.time.Instant.ofEpochSecond(1700000123L),
      java.time.LocalDateTime.of(2024, 5, 6, 7, 8, 9),
      134530, // 13:45:30
      wkb)
    val maps = scala.collection.mutable.Map.empty[Long, TableMap]
    parseEvent(StubBinlog.tableMap(91L, "db1", "t", cols), maps)
    val ev = parseEvent(
      StubBinlog.writeRows(91L, colMeta, Seq(values)), maps).asInstanceOf[Rows]
    val row = ev.rows.head._2
    assert(row(0) == 2)
    assert(row(1) == 300)
    assert(row(2) == 0x0105L)
    assert(row(3) == 0x2abL)
    assert(row(4) == "{\"a\":7,\"bc\":\"x\"}")
    assert(row(5) == java.time.Instant.ofEpochSecond(1700000123L))
    assert(row(6) == java.time.LocalDateTime.of(2024, 5, 6, 7, 8, 9))
    assert(row(7) == java.time.Duration.ofHours(13).plusMinutes(45).plusSeconds(30))
    assert(row(8).asInstanceOf[Array[Byte]].toSeq == wkb.toSeq)
  }

  test("zero-date timestamps decode to null; negative pre-5.6 TIME keeps its sign") {
    // TIMESTAMP2(0) with sec=0 is the '0000-00-00 00:00:00' sentinel ->
    // null (NOT epoch 1970); same for the pre-5.6 4-byte form; pre-5.6
    // TIME stores a SIGNED int24 of +-HHMMSS, so '-01:00:00' is the
    // two's-complement of 10000 (0xffd8f0 LE = f0 d8 ff)
    val golden = "00000000" + "00000000" + "f0d8ff"
    val cols = Seq((17, 0), (7, 0), (11, 0))
    val body = new ByteWriter()
      .u48(78L).u16(1).u16(2)
      .lenenc(cols.size.toLong)
      .u8(0x07) // present bitmap: all 3
      .u8(0x00) // null bitmap: none
      .bytes(unhex(golden))
      .result()
    val header = new ByteWriter()
      .u32(1700000000L).u8(WRITE_ROWS_V2).u32(99L)
      .u32(19L + body.length).u32(6000L).u16(0)
      .result()
    val maps = scala.collection.mutable.Map.empty[Long, TableMap]
    maps(78L) = TableMap(EventHeader(0L, TABLE_MAP_EVENT, 99L, 0L, 0L, 0),
      78L, "db1", "zt", cols.map(_._1).toArray, cols.map(_._2).toArray,
      Array.fill(cols.size)(false))
    val ev = parseEvent(header ++ body, maps).asInstanceOf[Rows]
    val row = ev.rows.head._2
    assert(row(0) == null, "TIMESTAMP2 zero-date must be null")
    assert(row(1) == null, "pre-5.6 TIMESTAMP zero-date must be null")
    assert(row(2) == java.time.Duration.ofHours(-1),
      s"negative TIME decoded as ${row(2)}")
  }
}
