package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** CDC per-key LWW compaction on the arbitrary-stateful-v2 API
  * (transformWithState + RocksDB state store): the scheduler semantics of
  * core.ChangeLog.compact as an incremental streaming operator. Kept
  * value = (seq, op, payload) with the HIGHEST seq per key; a lower or
  * equal seq arriving later (replay, out-of-order worker) must NOT
  * regress the state — the same convergence rule the snapshot sink's
  * tombstoned seq-LWW enforces at rest.
  */
private[streaming] class LwwProcessor
      extends StatefulProcessor[Long, (Long, Long, String, String), (Long, Long, String, String)] {
    @transient private var st: ValueState[(Long, String, String)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[(Long, String, String)](
        "lww", Encoders.product[(Long, String, String)], TTLConfig.NONE)

    override def handleInputRows(
        key: Long,
        rows: Iterator[(Long, Long, String, String)],
        timerValues: TimerValues): Iterator[(Long, Long, String, String)] = {
      var cur = if (st.exists()) Option(st.get()) else None
      rows.foreach { case (_, seq, op, v) =>
        if (cur.forall(_._1 < seq)) cur = Some((seq, op, v))
      }
      cur.foreach(st.update)
      cur.map(c => (key, c._1, c._2, c._3)).iterator
    }
}

class TransformWithStateSpec extends SparkSpec with org.scalatest.BeforeAndAfterAll {

  // every test here sets the RocksDB provider; restore the shared
  // session's default after the suite so later suites run on the
  // provider they were written against
  override def afterAll(): Unit =
    spark.conf.unset("spark.sql.streaming.stateStore.providerClass")

  import spark.implicits._

  test("transformWithState LWW compaction converges under replay and out-of-order seqs") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String, String)] // pk, seq, op, value
    val compacted = mem.toDS
      .groupByKey(_._1)
      .transformWithState(new LwwProcessor, TimeMode.None(), OutputMode.Update())

    val q = compacted.toDF("pk", "seq", "op", "v").writeStream
      .outputMode(OutputMode.Update())
      .format("memory").queryName("tws_lww").start()
    withStream(q) {
      // batch 1: inserts + an update
      mem.addData((1L, 10L, "insert", "a"), (1L, 11L, "update", "a2"), (2L, 20L, "insert", "b"))
      q.processAllAvailable()
      // batch 2: REPLAY of seq 10 (must not regress pk 1), out-of-order
      // lower seq for pk 2 (ignored), genuine advance for pk 2, delete pk 1
      mem.addData((1L, 10L, "insert", "a"), (2L, 19L, "update", "stale"),
        (2L, 21L, "update", "b2"), (1L, 12L, "delete", "a2"))
      q.processAllAvailable()
    }

    val last = spark.table("tws_lww")
      .groupBy(col("pk")).agg(max(struct(col("seq"), col("op"), col("v"))).as("s"))
      .select(col("pk"), col("s.seq"), col("s.op"), col("s.v"))
      .as[(Long, Long, String, String)].collect().toSet
    assert(last == Set(
      (1L, 12L, "delete", "a2"), // delete wins by seq; replay of 10 ignored
      (2L, 21L, "update", "b2"))) // stale 19 ignored, 21 applied
  }
}
