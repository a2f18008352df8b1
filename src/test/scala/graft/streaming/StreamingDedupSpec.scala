package graft.streaming

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** The streaming band-bucket dedup must emit, cumulatively, EXACTLY the
  * candidate set of the batch band self-join on the same documents —
  * independent of how the docs are split into micro-batches — and must
  * not re-emit on replay.
  */
class StreamingDedupSpec extends SparkSpec with org.scalatest.BeforeAndAfterAll {

  // every test here sets the RocksDB provider; restore the shared
  // session's default after the suite so later suites run on the
  // provider they were written against
  override def afterAll(): Unit =
    spark.conf.unset("spark.sql.streaming.stateStore.providerClass")

  import spark.implicits._

  private def batchPairs(docs: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = {
    val bands = StreamingDedup.bandKeys(docs).toDF("bucket", "doc_id")
    bands.as("a").join(bands.as("b"),
        col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"))
      .distinct().as[(Long, Long)].collect().toSet
  }

  test("streaming LSH dedup emits the batch candidate set across micro-batches, replay-safe") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    implicit val sc = spark.sqlContext

    // sf0.001 docs + planted copies (the docsPlus shape) as plain rows
    val base = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text"))
    val planted = base.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    val rows = base.unionByName(planted).as[(Long, String)].collect().toSeq
    val (firstHalf, secondHalf) = rows.splitAt(rows.length / 2)

    val mem = MemoryStream[(Long, String)]
    val q = StreamingDedup.candidatePairs(mem.toDS.toDF("doc_id", "text"))
      .toDF("doc_a", "doc_b").writeStream
      .outputMode(OutputMode.Update())
      .format("memory").queryName("sdedup").start()

    withStream(q) {
      mem.addData(firstHalf)
      q.processAllAvailable()
      mem.addData(secondHalf)
      q.processAllAvailable()

      val expected = batchPairs(base.unionByName(planted))
      def emitted(): Set[(Long, Long)] =
        spark.table("sdedup").as[(Long, Long)].collect().toSet
      assert(emitted() == expected,
        "cumulative streamed candidates must equal the batch band join")

      // replay the first half: no state regression, no new pairs
      val before = spark.table("sdedup").count()
      mem.addData(firstHalf)
      q.processAllAvailable()
      assert(emitted() == expected)
      assert(spark.table("sdedup").count() == before, "replay must emit nothing")
    }
  }

  test("band bucket cap stops state growth but still pairs against retained members") {
    withRocksDbStateStore {
      implicit val sc = spark.sqlContext
      // identical text => identical signature => one bucket per band
      val mem = MemoryStream[(Long, String)]
      val q = StreamingDedup.candidatePairs(
          mem.toDS.toDF("doc_id", "text"), maxBucket = 2)
        .toDF("doc_a", "doc_b").writeStream
        .outputMode(OutputMode.Update())
        .format("memory").queryName("sdedup_cap").start()
      val text = "alpha beta gamma delta epsilon zeta eta theta"
      withStream(q) {
        mem.addData((1L, text), (2L, text))
        q.processAllAvailable()
        mem.addData((3L, text)) // bucket is at cap: 3 pairs with 1 and 2, not stored
        q.processAllAvailable()
        mem.addData((4L, text)) // still pairs against retained {1, 2} only
        q.processAllAvailable()
      }
      val got = spark.table("sdedup_cap").as[(Long, Long)].collect().toSet
      assert(got == Set((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L)))
    }
  }

  // State stays BOUNDED over an unbounded stream: members older than
  // watermark - horizon are evicted and never pair again, while pairs
  // inside the horizon are still emitted. Watermark delay 0s, horizon 1h;
  // timestamps chosen so the two-phase watermark (batch N evicts with the
  // watermark established after batch N-1) is pinned explicitly:
  //   b1: doc1@10:00 doc2@10:30 -> pair (1,2);        wm after b1 = 10:30
  //   b2: doc3@12:00  (threshold 9:30, both kept)  -> (1,3) (2,3); wm = 12:00
  //   b3: doc4@12:30  (threshold 11:00: 1,2 EVICTED, 3 kept) -> (3,4) only
  //   b4: doc5@12:40  (threshold 11:30: 3,4 kept)  -> (3,5) (4,5)
  test("event-time horizon evicts old members; in-horizon pairs unchanged") {
    withRocksDbStateStore {
    implicit val sc = spark.sqlContext
    val text = "alpha beta gamma delta epsilon zeta eta theta"
    val ts = (s: String) => java.sql.Timestamp.valueOf(s"2025-01-01 $s:00")
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    val q = StreamingDedup.expiringCandidatePairs(
        mem.toDS.toDF("doc_id", "text", "ts"),
        delay = "0 seconds", horizonMs = 3600000L)
      .toDF("doc_a", "doc_b").writeStream
      .outputMode(OutputMode.Update())
      .format("memory").queryName("sdedup_ttl").start()
    withStream(q) {
      mem.addData((1L, text, ts("10:00")), (2L, text, ts("10:30")))
      q.processAllAvailable()
      mem.addData((3L, text, ts("12:00")))
      q.processAllAvailable()
      mem.addData((4L, text, ts("12:30")))
      q.processAllAvailable()
      mem.addData((5L, text, ts("12:40")))
      q.processAllAvailable()
    }
    val got = spark.table("sdedup_ttl").as[(Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 2L), (1L, 3L), (2L, 3L), // inside the horizon: the batch set
      (3L, 4L), // 1 and 2 evicted before doc4 — no (1,4)/(2,4)
      (3L, 5L), (4L, 5L)),
      s"horizon eviction contract broken, emitted: $got")
    }
  }
}
