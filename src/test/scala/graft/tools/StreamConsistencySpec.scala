package graft.tools

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** dcp checker semantics: per-segment verdicts (Same/Diff/Timeout) and
  * the streaming barrier-close emission.
  */
class StreamConsistencySpec extends SparkSpec with org.scalatest.BeforeAndAfterAll {

  // every test here sets the RocksDB provider; restore the shared
  // session's default after the suite so later suites run on the
  // provider they were written against
  override def afterAll(): Unit =
    spark.conf.unset("spark.sql.streaming.stateStore.providerClass")

  import spark.implicits._

  test("verdicts: same / diff (corrupt, missing, extra) / timeout") {
    // checks rows: (segment, payload_id, tag, checks)
    val checks = Seq(
      // segment 0: identical -> same
      (0L, "a", "src", Seq("c1")), (0L, "a", "dst", Seq("c1")),
      (0L, "b", "src", Seq("c2", "c3")), (0L, "b", "dst", Seq("c2", "c3")),
      // segment 1: corrupted checksum list -> diff (n_diff=1)
      (1L, "a", "src", Seq("c1")), (1L, "a", "dst", Seq("cX")),
      // segment 2: missing id in target + extra id in target -> diff
      (2L, "a", "src", Seq("c1")),
      (2L, "b", "dst", Seq("c9")),
      // segment 3: target never arrived -> timeout
      (3L, "a", "src", Seq("c1"))
    ).toDF("segment", "payload_id", "tag", "checks")
    val v = StreamConsistency.verdicts(checks, "src", "dst")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getString(6))).toMap
    assert(v(0L) == ((0L, 0L, 0L, "same")))
    assert(v(1L) == ((0L, 0L, 1L, "diff")))
    assert(v(2L) == ((1L, 1L, 0L, "diff")))
    assert(v(3L) == ((1L, 0L, 0L, "timeout")))
  }

  test("streaming path: an injected mismatch is detected once the barrier closes the segment") {
    withRocksDbStateStore {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(String, Long, String, Long, String)]
    val q = StreamConsistency.segmentChecks(
        mem.toDS.toDF("tag", "barrier", "payload_id", "ord", "checksum"))
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("dcp_checks").start()
    withStream(q) {
      // segment 0 traffic: src and dst agree on k1, dst corrupts k2
      mem.addData(
        ("src", 0L, "k1", 1L, "h1"), ("dst", 0L, "k1", 1L, "h1"),
        ("src", 0L, "k2", 2L, "h2"), ("dst", 0L, "k2", 2L, "hX"))
      q.processAllAvailable()
      // barrier close (ts 1) + a flusher batch: two-phase watermark means
      // emission happens the batch AFTER the watermark advances past 1
      mem.addData(("src", 1L, "_close", 0L, "x"))
      q.processAllAvailable()
      mem.addData(("src", 2L, "_close2", 0L, "x"))
      q.processAllAvailable()
    }
    val emitted = spark.table("dcp_checks")
    val v = StreamConsistency.verdicts(emitted, "src", "dst")
      .filter(col("segment") === 0).collect()
    assert(v.length == 1)
    assert(v.head.getString(6) == "diff", s"injected mismatch missed: ${v.toSeq}")
    assert(v.head.getLong(5) == 1L) // exactly the corrupted payload id
    }
  }
}
