package graft.sources

import graft.SparkSpec
import graft.sinks.{KafkaWire, StubKafkaBroker}
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** The wire-backed Kafka input end-to-end: records produced over the
  * wire come back through the MicroBatchStream seat, the checkpointed
  * offset is the consumer position across restarts, and the raw payload
  * composes with the downstream CDC decoders.
  */
class KafkaStreamSpec extends SparkSpec {
  import spark.implicits._

  private val fmt = "graft.sources.KafkaStreamSource"

  private def produce(broker: StubKafkaBroker, topic: String,
      records: Seq[(String, String)]): Unit = {
    val p = new KafkaWire.KafkaWireProducer("127.0.0.1", broker.port).connect()
    try p.produce(topic, 0, records.map { case (k, v) =>
      (k.getBytes("UTF-8"), v.getBytes("UTF-8")) }, timestampMs = 1700000000000L)
    finally p.close()
  }

  test("produced records stream back through the MicroBatchStream seat in offset order") {
    val broker = new StubKafkaBroker
    try {
      produce(broker, "cdc", (0 until 7).map(i => (s"key$i", s"""{"n":$i}""")))
      val out = "kafka_stream_e2e"
      val q = spark.readStream.format(fmt)
        .option("host", "127.0.0.1").option("port", broker.port)
        .option("topic", "cdc").option("stopAtHighWater", true)
        .option("rowsPerBatch", 3)
        .load()
        .writeStream.format("memory").queryName(out)
        .trigger(Trigger.AvailableNow()).start()
      withStream(q)(q.awaitTermination())
      val got = spark.table(out).selectExpr("seq", "key", "value")
        .as[(Long, String, String)].collect().sortBy(_._1)
      assert(got.toSeq == (0 until 7).map(i => (i.toLong, s"key$i", s"""{"n":$i}""")))
      // kafka offsets ARE the positions: dense from 0
      assert(got.map(_._1).toSeq == (0L until 7L))
    } finally broker.close()
  }

  test("the streaming seat reads a broker serving RecordBatch v2 (lz4) unchanged") {
    val broker = new StubKafkaBroker(serveV2Batches = true, v2Codec = 3)
    try {
      produce(broker, "cdc", (0 until 5).map(i => (s"key$i", s"""{"n":$i}""")))
      val out = "kafka_stream_v2"
      val q = spark.readStream.format(fmt)
        .option("host", "127.0.0.1").option("port", broker.port)
        // the 4.x dialect end-to-end: fetch v4 headers around v2 batches
        .option("fetchVersion", 4)
        .option("topic", "cdc").option("stopAtHighWater", true)
        .load()
        .writeStream.format("memory").queryName(out)
        .trigger(Trigger.AvailableNow()).start()
      withStream(q)(q.awaitTermination())
      val got = spark.table(out).selectExpr("seq", "key", "value")
        .as[(Long, String, String)].collect().sortBy(_._1)
      assert(got.toSeq == (0 until 5).map(i => (i.toLong, s"key$i", s"""{"n":$i}""")))
    } finally broker.close()
  }

  test("the checkpointed offset is the consumer position: restart reads only new records") {
    val broker = new StubKafkaBroker
    try {
      produce(broker, "cdc", Seq(("a", "1"), ("b", "2"), ("c", "3")))
      val ckpt = Files.createTempDirectory("kafka-stream").toString
      def run(): Seq[(Long, String)] = {
        val got = Seq.newBuilder[(Long, String)]
        val q = spark.readStream.format(fmt)
          .option("host", "127.0.0.1").option("port", broker.port)
          .option("topic", "cdc").option("stopAtHighWater", true)
          .load()
          .writeStream
          .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
            got ++= df.selectExpr("seq", "value").collect()
              .map(r => (r.getLong(0), r.getString(1)))
            ()
          }
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        withStream(q)(q.awaitTermination())
        got.result()
      }
      assert(run().map(_._2).sorted == Seq("1", "2", "3"))
      // the broker's log grows while the consumer is away
      produce(broker, "cdc", Seq(("d", "4"), ("e", "5")))
      assert(run() == Seq((3L, "4"), (4L, "5")),
        "the re-fetched prefix must be absorbed by the checkpointed offset")
    } finally broker.close()
  }

  test("raw payloads compose with the downstream CDC decoder (tidb JSON v0.1)") {
    val broker = new StubKafkaBroker
    try {
      val v01 = """{"version":"0.1","database":"shop","table":"orders",""" +
        """"type":"insert","data":{"id":"7","status":"OPEN"}}"""
      produce(broker, "cdc", Seq(("7", v01)))
      val out = "kafka_stream_decode"
      val q = spark.readStream.format(fmt)
        .option("host", "127.0.0.1").option("port", broker.port)
        .option("topic", "cdc").option("stopAtHighWater", true)
        .load()
        .writeStream.format("memory").queryName(out)
        .trigger(Trigger.AvailableNow()).start()
      withStream(q)(q.awaitTermination())
      // the decode seat: same parser the file-form kafka input uses
      val decoded = graft.sources.KafkaCdc.envelopeFromV01(
        spark.table(out), org.apache.spark.sql.functions.col("seq"))
      val row = decoded.selectExpr("database", "table", "op",
        "element_at(data, 'id')", "element_at(data, 'status')")
        .as[(String, String, String, String, String)].head()
      assert(row == (("shop", "orders", "insert", "7", "OPEN")))
    } finally broker.close()
  }
}
