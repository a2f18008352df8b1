package graft.sources

import graft.SparkSpec
import graft.sources.MongoWire.BVal
import graft.sources.MongoWire.BVal._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** The wire-backed Mongo CDC streaming source end-to-end: a stub mongod
  * serves a canned oplog over the cursor protocol, [[OplogStreamSource]]
  * tails it into micro-batches with the delta posture intact, and the
  * checkpointed oplog timestamp absorbs a resumed primary's replay.
  */
class OplogStreamSpec extends SparkSpec {
  import spark.implicits._

  private val fmt = "graft.sources.OplogStreamSource"

  private def baseOplog: Seq[BDoc] = Seq(
    BVal.doc("ts" -> BTs(100L, 1L), "op" -> BStr("i"), "ns" -> BStr("shop.orders"),
      "o" -> BVal.doc("_id" -> BInt(7), "status" -> BStr("OPEN"), "total" -> BDouble(12.5))),
    BVal.doc("ts" -> BTs(101L, 1L), "op" -> BStr("u"), "ns" -> BStr("shop.orders"),
      "o2" -> BVal.doc("_id" -> BInt(7)),
      "o" -> BVal.doc( // delta update: $set + $unset ride through as partials
        "$set" -> BVal.doc("status" -> BStr("SHIPPED")),
        "$unset" -> BVal.doc("total" -> BBool(true)))),
    BVal.doc("ts" -> BTs(102L, 1L), "op" -> BStr("n"), // noop heartbeat: skipped
      "ns" -> BStr(""), "o" -> BVal.doc("msg" -> BStr("ping"))),
    BVal.doc("ts" -> BTs(103L, 1L), "op" -> BStr("d"), "ns" -> BStr("shop.orders"),
      "o" -> BVal.doc("_id" -> BInt(5))))

  test("stub mongod → oplog tailer → micro-batches with the delta posture intact") {
    val srv = new StubMongod(baseOplog, batchSize = 2)
    try {
      val out = "oplog_stream_e2e"
      val q = spark.readStream.format(fmt)
        .option("host", "127.0.0.1").option("port", srv.port)
        .option("afterSec", 99).option("afterInc", 0)
        .load()
        .writeStream.format("memory").queryName(out)
        .trigger(Trigger.AvailableNow()).start()
      withStream(q)(q.awaitTermination())
      val got = spark.table(out)
        .selectExpr("op", "database", "table", "id",
          "element_at(data, 'status')", "cast(unset as string)")
        .as[(String, String, String, String, String, String)].collect().toSet
      assert(got == Set(
        ("insert", "shop", "orders", "7", "OPEN", "[]"),
        ("update", "shop", "orders", "7", "SHIPPED", "[total]"),
        ("delete", "shop", "orders", "5", null, "[]")))
      // offsets are the oplog's own (sec, inc) order
      val seqs = spark.table(out).select("seq").as[Long].collect().toSeq
      assert(seqs.sorted == seqs && seqs.head == (100L << 32 | 1L))
      // the resume position rode the find filter server-side
      assert(srv.findFilterTs.contains(BTs(99L, 0L)))
      assert(srv.sawTailableFind)
    } finally srv.close()
  }

  test("an auth-required mongod is tailed after SCRAM via the source's user/password options") {
    val srv = new StubMongod(baseOplog, batchSize = 2,
      auth = Some(("tailer", "s3cret", "SCRAM-SHA-256")))
    try {
      val out = "oplog_stream_scram"
      val q = spark.readStream.format(fmt)
        .option("host", "127.0.0.1").option("port", srv.port)
        .option("user", "tailer").option("password", "s3cret")
        .option("afterSec", 99).option("afterInc", 0)
        .load()
        .writeStream.format("memory").queryName(out)
        .trigger(Trigger.AvailableNow()).start()
      withStream(q)(q.awaitTermination())
      assert(srv.authOk, "the streaming seat must run the SCRAM conversation")
      assert(spark.table(out).count() == 3)
    } finally srv.close()
  }

  test("restart absorbs the primary's replay and delivers only new entries") {
    val extra = Seq(
      BVal.doc("ts" -> BTs(104L, 1L), "op" -> BStr("i"), "ns" -> BStr("shop.orders"),
        "o" -> BVal.doc("_id" -> BInt(9), "status" -> BStr("NEW"))),
      BVal.doc("ts" -> BTs(104L, 2L), "op" -> BStr("d"), "ns" -> BStr("shop.orders"),
        "o" -> BVal.doc("_id" -> BInt(7))))
    val srv = new StubMongod(baseOplog, batchSize = 2, moreOplog = extra)
    try {
      val ckpt = Files.createTempDirectory("oplog-stream").toString
      def run(): Seq[(String, String)] = {
        val got = Seq.newBuilder[(String, String)]
        val q = spark.readStream.format(fmt)
          .option("host", "127.0.0.1").option("port", srv.port)
          .option("afterSec", 99).option("afterInc", 0)
          .load()
          .writeStream
          .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
            got ++= df.selectExpr("op", "id").collect()
              .map(r => (r.getString(0), r.getString(1)))
            ()
          }
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        withStream(q)(q.awaitTermination())
        got.result()
      }
      val first = run()
      assert(first.map(_._1).sorted == Seq("delete", "insert", "update"))
      // run 2: the primary replays history plus the tail (second
      // connection sees base ++ extra); only the tail may surface —
      // ts(104,1) and ts(104,2) prove inc-level ordering too
      val second = run()
      assert(second == Seq(("insert", "9"), ("delete", "7")),
        s"replayed history must be absorbed in order, got $second")
      assert(srv.conns == 2)
    } finally srv.close()
  }

  test("a dead mongod surfaces as a query error, not a silent empty stream") {
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
      _.contains("graft-oplog-tailer failed"))))
  }
}
