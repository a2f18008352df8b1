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
    withStream(q)(q.awaitTermination())

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
    withStream(q)(q.awaitTermination())
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
    withStream(q)(q.awaitTermination())
    assert(spark.table("state_counts").as[(Long, Long)].collect().toSet ==
      Set((1L, 2L), (2L, 1L)))
  }

  test("flatMapGroupsWithState funnel matches the batch evt_funnel_stages result") {
    // the streaming formulation of PrepQueries.evt_funnel_stages: a
    // per-user state machine (first view, then first click within 24h,
    // then first purchase within 24h) advanced incrementally across
    // micro-batches; the final per-stage user counts must equal the
    // batch query's on the same real events sample
    implicit val sc = spark.sqlContext
    val dayUs = 24L * 3600 * 1000000
    val mem = MemoryStream[(Long, String, Long)] // user, type, epoch-micros
    val staged = mem.toDS
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Option[Long], Option[Long], Option[Long]), (Long, Int)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, String, Long)],
         state: GroupState[(Option[Long], Option[Long], Option[Long])]) =>
          var (t1, t2, t3) = state.getOption
            .getOrElse((Option.empty[Long], Option.empty[Long], Option.empty[Long]))
          // events arrive in-order per user here; a production deployment
          // sorts within the micro-batch and bounds lateness by watermark
          rows.toSeq.sortBy(_._3).foreach { case (_, typ, t) =>
            if (typ == "view" && t1.isEmpty) t1 = Some(t)
            else if (typ == "click" && t2.isEmpty &&
              t1.exists(a => t > a && t <= a + dayUs)) t2 = Some(t)
            else if (typ == "purchase" && t3.isEmpty &&
              t2.exists(a => t > a && t <= a + dayUs)) t3 = Some(t)
          }
          state.update((t1, t2, t3))
          Iterator((user, Seq(t1, t2, t3).count(_.isDefined)))
      }
    // feed the real sf0.001 events in two ts-ordered batches
    val evs = Tables.events(spark, sf0001)
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"),
        col("event_type"), unix_micros(col("ts").cast("timestamp")))
      .as[(Long, String, Long)].collect().sortBy(_._3)
    val (b1, b2) = evs.splitAt(evs.length / 2)
    val q = staged.toDF("user_id", "stage").writeStream
      .outputMode(OutputMode.Update())
      .format("memory").queryName("funnel_state").start()
    withStream(q) {
      mem.addData(b1.toSeq: _*); q.processAllAvailable()
      mem.addData(b2.toSeq: _*); q.processAllAvailable()
    }
    // last update per user = final stage reached
    val finalStages = spark.table("funnel_state")
      .groupBy(col("user_id")).agg(max(col("stage")).as("stage"))
      .groupBy(col("stage")).agg(countDistinct(col("user_id")).as("n_users"))
      .as[(Long, Long)].collect().toMap
    // batch truth, restricted to users with at least one of the 3 events
    // (streaming state only exists for observed users; the batch query
    // also counts users whose events are all other types as stage 0)
    val batch = graft.analytics.Catalog.queries("evt_funnel_stages")(spark, sf0001)
      .as[(Long, Long)].collect().toMap
    val observedUsers = Tables.events(spark, sf0001)
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(countDistinct(col("user_id"))).as[Long].head()
    val allUsers = Tables.events(spark, sf0001)
      .select(countDistinct(col("user_id"))).as[Long].head()
    val batchAdj = batch.updated(0L,
      batch.getOrElse(0L, 0L) - (allUsers - observedUsers))
      .filter(_._2 > 0)
    assert(finalStages.filter(_._2 > 0) == batchAdj)
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
    withStream(q)(q.awaitTermination())
    val got = spark.table("ss_join").select("user_id", "value")
      .as[(Long, Double)].collect().toSet
    assert(got == Set((1L, 5.0)))
  }

  test("watermark drops late data: a row older than watermark-delay is not aggregated") {
    // two batches: the first advances the watermark past 11:00 (max ts
    // 12:30 - 1h delay => 11:30); the second's 10:05 row is late and must
    // be DROPPED, not merged into the 10:00 window
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    // group on the window STRUCT (not .getField("start")) — the late-row
    // filter attaches to the watermarked window key; a derived scalar key
    // would not be recognized as the event-time column
    val agg = mem.toDF.toDF("ts", "k")
      .withWatermark("ts", "1 hour")
      .groupBy(window($"ts", "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select($"window.start".as("ws"), $"n")
    val q = agg.writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("late_drop").trigger(Trigger.ProcessingTime(0)).start()
    withStream(q) {
      mem.addData((ts("2024-01-01 10:05:00"), "a"), (ts("2024-01-01 12:30:00"), "b"))
      q.processAllAvailable()
      mem.addData((ts("2024-01-01 10:06:00"), "late")) // behind the 11:30 watermark
      q.processAllAvailable()
    }
    val got = spark.table("late_drop")
      .groupBy($"ws").agg(max($"n").as("n"))
      .as[(Timestamp, Long)].collect().toMap
    // the late row did NOT bump the 10:00 window's count
    assert(got(ts("2024-01-01 10:00:00")) == 1L)
    assert(got(ts("2024-01-01 12:00:00")) == 1L)
  }

  test("stream-stream LEFT OUTER join emits unmatched left rows after watermark passes") {
    // left-outer stream join: matched rows emit immediately; unmatched
    // left rows emit with nulls only once the watermark proves no match
    // can still arrive — the state-bounded outer-join semantics
    implicit val sc = spark.sqlContext
    val signups = MemoryStream[(Timestamp, Long)]
    val purchases = MemoryStream[(Timestamp, Long, Double)]
    val s = signups.toDF.toDF("s_ts", "user_id").withWatermark("s_ts", "1 hour")
    val p = purchases.toDF.toDF("p_ts", "p_user", "value").withWatermark("p_ts", "1 hour")
    val joined = s.join(p,
      $"user_id" === $"p_user" &&
        $"p_ts" >= $"s_ts" && $"p_ts" <= $"s_ts" + expr("INTERVAL 1 HOUR"),
      "left_outer")
      .select($"user_id", $"value")
    val q = joined.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("ss_left_join").trigger(Trigger.ProcessingTime(0)).start()
    withStream(q) {
      signups.addData((ts("2024-01-01 10:00:00"), 1L), (ts("2024-01-01 10:00:00"), 2L))
      purchases.addData((ts("2024-01-01 10:30:00"), 1L, 5.0))
      q.processAllAvailable()
      // advance both watermarks far past user 2's join window
      signups.addData((ts("2024-01-01 15:00:00"), 9L))
      purchases.addData((ts("2024-01-01 15:00:00"), 9L, 1.0))
      q.processAllAvailable()
    }
    val got = spark.table("ss_left_join").as[(Long, Option[Double])].collect().toSet
    assert(got.contains((1L, Some(5.0)))) // matched inside the hour
    assert(got.contains((2L, None)))      // emitted as unmatched after watermark
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
    withStream(q)(q.awaitTermination())

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

  test("replay dedup: the STREAM suppresses at-least-once duplicates itself") {
    // the catalog entry's read-back dedups task-retry copies, which
    // could mask a broken dropDuplicatesWithinWatermark — here the RAW
    // emitted rows are counted: each event must emit exactly once even
    // though every 13th is fed twice
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.Trigger
    val work = graft.analytics.Q.scratch("sdw-spec")
    val ev = graft.core.Tables.events(spark, sf0001)
      .select(col("event_id"), col("ts").cast("timestamp").as("ts"))
    val feed = ev.unionByName(ev.filter(col("event_id") % 13 === 0))
    val nFed = feed.count()
    val nDistinct = ev.count()
    assert(nFed > nDistinct, "replays must actually be planted")
    feed.repartitionByRange(2, col("ts")).write.mode("overwrite")
      .parquet(s"$work/in")
    val q = spark.readStream.schema(feed.schema).parquet(s"$work/in")
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .writeStream.format("parquet")
      .option("path", s"$work/out")
      .option("checkpointLocation", s"$work/ckpt")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    withStream(q)(q.awaitTermination())
    val raw = spark.read.parquet(s"$work/out")
    assert(raw.count() == nDistinct,
      s"raw emitted ${raw.count()} rows, want $nDistinct (no replay leaks)")
    assert(raw.select("event_id").distinct().count() == nDistinct)
  }
}
