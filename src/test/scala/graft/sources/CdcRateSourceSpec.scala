package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** The custom MicroBatchStream CDC source: offset semantics (resume from
  * checkpoint, exactly-once emission of the bounded range) and the
  * end-to-end pipeline over it.
  */
class CdcRateSourceSpec extends SparkSpec {
  import spark.implicits._

  private val fmt = "graft.sources.CdcRateSource"

  test("bounded stream emits the exact range once under AvailableNow") {
    val out = "cdc_rate_all"
    val q = spark.readStream.format(fmt)
      .option("maxSeq", 500).option("rowsPerBatch", 64).load()
      .writeStream.format("memory").queryName(out)
      .trigger(Trigger.AvailableNow()).start()
    withStream(q)(q.awaitTermination())
    val seqs = spark.table(out).select("seq").as[Long].collect().sorted
    assert(seqs.toSeq == (0L until 500L))
    val ops = spark.table(out).groupBy("op").count()
      .as[(String, Long)].collect().toMap
    assert(ops == Map("insert" -> 350L, "update" -> 100L, "delete" -> 50L))
  }

  test("offsets checkpoint: a restarted query resumes where the last run stopped") {
    val ckpt = Files.createTempDirectory("cdc-rate").toString
    def run(): Long = {
      var rows = 0L
      val q = spark.readStream.format(fmt)
        .option("maxSeq", 300).option("rowsPerBatch", 50).load()
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          rows += df.count()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      withStream(q)(q.awaitTermination())
      rows
    }
    assert(run() == 300)
    // restart against the same checkpoint: everything already committed,
    // nothing re-emitted (the position survived like a binlog GTID would)
    assert(run() == 0)
  }

  test("pipeline over the custom source compacts to the expected final state") {
    val ckpt = Files.createTempDirectory("cdc-rate-p").toString
    val snap = Files.createTempDirectory("cdc-rate-s").toString + "/t"
    val src = spark.readStream.format(fmt)
      .option("maxSeq", 200).option("rowsPerBatch", 200)
      .option("numKeys", 20).load()
    val sink = new graft.streaming.SnapshotBatchSink(spark, snap, Seq("id"))
    val plan = graft.streaming.PipelinePlan(
      name = "cdc-rate-pipe", pkCols = Seq("id"), checkpoint = ckpt)
    val q = graft.streaming.PipelineRunner.start(plan, src, sink,
      trigger = Trigger.AvailableNow())
    withStream(q)(q.awaitTermination())
    // expected: per key, the row with max seq; keys whose final op was
    // delete are absent from the live view
    val expected = (0L until 200L).groupBy(_ % 20).flatMap { case (k, seqs) =>
      val last = seqs.max
      if (last % 10 == 9) None else Some(k -> s"v$last")
    }
    val got = sink.read().select("id", "v").as[(Long, String)].collect().toMap
    assert(got == expected)
  }
}
