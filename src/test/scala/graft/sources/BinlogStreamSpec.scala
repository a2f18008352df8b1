package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.concurrent.Eventually.{eventually, interval, timeout}
import org.scalatest.time.{Seconds, Span}
import java.nio.file.Files

/** The wire-backed CDC streaming source end-to-end: a stub MySQL master
  * streams a canned binlog over a real socket, [[BinlogStreamSource]]
  * tails it through [[BinlogWire.BinlogClient]] into micro-batches, and
  * the checkpointed log position gives resume-with-replay-absorption —
  * the full mysql-stream input shape (tailer + position + sliding
  * window) over one Structured Streaming query.
  */
class BinlogStreamSpec extends SparkSpec {
  import spark.implicits._

  private val fmt = "graft.sources.BinlogStreamSource"
  private val cols = Seq((3, 0, false), (15, 40, true)) // LONG id, VARCHAR(40) name
  private val colMeta = cols.map { case (t, m, _) => (t, m) }

  private def baseEvents: Seq[Array[Byte]] = Seq(
    StubBinlog.fde(),
    StubBinlog.tableMap(52L, "shop", "orders", cols),
    StubBinlog.writeRows(52L, colMeta, Seq(Seq(1, "alice"), Seq(2, "bob"))),
    StubBinlog.updateRows(52L, colMeta, Seq((Seq(1, "alice"), Seq(1, "carol")))),
    // system-schema traffic the tailer must skip
    StubBinlog.tableMap(53L, "mysql", "user", cols),
    StubBinlog.writeRows(53L, colMeta, Seq(Seq(9, "root"))),
    StubBinlog.xid(11L))

  test("stub master → wire tailer → micro-batches: enveloped rows with named columns") {
    val srv = new StubMySqlServer("repl", "replpass", baseEvents)
    try {
      val out = "binlog_stream_e2e"
      val q = spark.readStream.format(fmt)
        .option("host", "127.0.0.1").option("port", srv.port)
        .option("user", "repl").option("password", "replpass")
        .option("names.shop.orders", "id,name")
        .option("pks.shop.orders", "id")
        .load()
        .writeStream.format("memory").queryName(out)
        .trigger(Trigger.AvailableNow()).start()
      withStream(q)(q.awaitTermination())
      val got = spark.table(out)
        .selectExpr("op", "database", "table",
          "element_at(data, 'id')", "element_at(data, 'name')")
        .as[(String, String, String, String, String)].collect().toSet
      assert(got == Set(
        ("insert", "shop", "orders", "1", "alice"),
        ("insert", "shop", "orders", "2", "bob"),
        ("update", "shop", "orders", "1", "carol")))
      // before image and pk identity ride old/pks
      val upd = spark.table(out).where("op = 'update'")
        .selectExpr("element_at(old, 'name')", "element_at(pks, 'id')")
        .as[(String, String)].head()
      assert(upd == (("alice", "1")))
      // offsets are non-decreasing log positions; rows from the SAME
      // event share its position (and so always land in one batch)
      val seqs = spark.table(out).select("seq").as[Long].collect().toSeq
      assert(seqs == seqs.sorted)
      assert(seqs.distinct.size == 2, "two row events → two positions")
      assert(srv.sawChecksumPin && srv.authOk)
    } finally srv.close()
  }

  test("restart absorbs the master's replay and delivers only new changes") {
    // dump #2 replays everything and appends the extra tail — the
    // checkpointed position must absorb the replayed prefix exactly
    val base = baseEvents
    val extra = Seq(
      StubBinlog.writeRows(52L, colMeta, Seq(Seq(3, "dave"), Seq(4, "erin"))),
      StubBinlog.deleteRows(52L, colMeta, Seq(Seq(2, "bob"))),
      StubBinlog.xid(12L))
    val srv = new StubMySqlServer("repl", "replpass", base, moreEvents = extra)
    try {
      val ckpt = Files.createTempDirectory("binlog-stream").toString
      def run(): Seq[(String, String)] = {
        val got = Seq.newBuilder[(String, String)]
        val q = spark.readStream.format(fmt)
          .option("host", "127.0.0.1").option("port", srv.port)
          .option("user", "repl").option("password", "replpass")
          .option("names.shop.orders", "id,name")
          .load()
          .writeStream
          .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
            got ++= df.selectExpr("op", "element_at(data, 'id')")
              .collect().map(r => (r.getString(0), r.getString(1)))
            ()
          }
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        withStream(q)(q.awaitTermination())
        got.result()
      }
      val first = run()
      assert(first.map(_._1).sorted == Seq("insert", "insert", "update"))
      // run 2: the master replays ALL of run 1's events plus the tail;
      // only the tail may surface
      val second = run()
      assert(second.toSet == Set(
        ("insert", "3"), ("insert", "4"), ("delete", "2")),
        s"replayed history must be absorbed, got $second")
      assert(srv.dumps == 2)
    } finally srv.close()
  }

  test("backpressure: a tiny buffer blocks the tailer, commits drain it, nothing is lost") {
    // 20 single-row inserts through a 3-row buffer
    val events = Seq(StubBinlog.fde(), StubBinlog.tableMap(60L, "shop", "t", cols)) ++
      (1 to 20).map(i => StubBinlog.writeRows(60L, colMeta, Seq(Seq(i, s"v$i")))) :+
      StubBinlog.xid(13L)
    val srv = new StubMySqlServer("repl", "replpass", events)
    try {
      val out = "binlog_stream_bp"
      val q = spark.readStream.format(fmt)
        .option("host", "127.0.0.1").option("port", srv.port)
        .option("user", "repl").option("password", "replpass")
        .option("maxBuffered", 3).option("rowsPerBatch", 2)
        .load()
        .writeStream.format("memory").queryName(out)
        .trigger(Trigger.ProcessingTime(50)).start()
      withStream(q) {
        eventually(timeout(Span(60, Seconds)), interval(Span(1, Seconds))) {
          assert(spark.table(out).count() == 20L)
        }
      }
      val ids = spark.table(out).selectExpr("element_at(data, 'c0')")
        .as[String].collect().map(_.toInt).sorted.toSeq
      assert(ids == (1 to 20))
    } finally srv.close()
  }

  test("a dead tailer surfaces as a query error, not a silent empty stream") {
    // no server listening on the port → connect fails inside the tailer
    val deadPort = {
      val s = new java.net.ServerSocket(0); val p = s.getLocalPort; s.close(); p
    }
    val q = spark.readStream.format(fmt)
      .option("host", "127.0.0.1").option("port", deadPort)
      .option("drainWaitMs", 2000)
      .load()
      .writeStream.format("noop")
      .trigger(Trigger.AvailableNow()).start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      withStream(q)(q.awaitTermination())
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
    assert(chain(e).exists(c => Option(c.getMessage).exists(
      _.contains("graft-binlog-tailer failed"))),
      s"expected the tailer failure in the cause chain: ${chain(e).map(_.getMessage)}")
  }

  test("gtid option dumps via COM_BINLOG_DUMP_GTID with the executed set on the wire") {
    val sid = "3e11fa47-71ca-11e1-9e33-c80aa9429562"
    val events = Seq(
      StubBinlog.fde(),
      StubBinlog.gtid(sid, 6L),
      StubBinlog.tableMap(61L, "shop", "t", cols),
      StubBinlog.writeRows(61L, colMeta, Seq(Seq(9, "zoe"))),
      StubBinlog.xid(5L))
    val srv = new StubMySqlServer("repl", "replpass", events)
    try {
      val out = "binlog_stream_gtid"
      val q = spark.readStream.format(fmt)
        .option("host", "127.0.0.1").option("port", srv.port)
        .option("user", "repl").option("password", "replpass")
        .option("gtid", s"$sid:1-5")
        .load()
        .writeStream.format("memory").queryName(out)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      withStream(q)(q.awaitTermination())
      assert(srv.dumpGtid.contains(GtidSet.parse(s"$sid:1-5")),
        "the configured executed set must reach the master on the wire")
      val got = spark.table(out).selectExpr("op", "element_at(data, 'c0')")
        .as[(String, String)].collect().toSeq
      assert(got == Seq(("insert", "9")))
    } finally srv.close()
  }
}
