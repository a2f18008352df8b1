package graft.streaming

import graft.core.ChangeLog
import graft.operators.{Router, TransformOp, TransformChain}
import graft.sinks.SnapshotSink
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The pipeline: one source, a filter chain, a router, one sink — the
  * reference's unit of deployment (config TOML → Input → Filters →
  * Scheduler → Output, /root/reference pkg/app/server.go:38-105), compiled
  * to one Structured Streaming query.
  *
  * The scheduler layer disappears by construction (SURVEY §2.4): per-key
  * ordering = pk-partitioned window inside the micro-batch; cross-batch
  * ordering = micro-batch serialization; ack/position tracking = the
  * streaming checkpoint's offset/commit log; retries = Spark task retry +
  * foreachBatch replay with idempotent (REPLACE-semantics) sinks.
  */
final case class PipelinePlan(
    name: String,
    transforms: Seq[TransformOp] = Nil,
    router: Option[Router] = None,
    pkCols: Seq[String],
    checkpoint: String)

/** Sink SPI for the batch hook: receives the compacted per-key batch. */
trait BatchSink extends Serializable {
  def write(batchId: Long, compacted: DataFrame): Unit
}

final class SnapshotBatchSink(spark: SparkSession, path: String, pkCols: Seq[String])
    extends BatchSink {
  private val sink = new SnapshotSink(spark, path, pkCols)
  def write(batchId: Long, compacted: DataFrame): Unit = sink.merge(compacted)
  def read(): DataFrame = sink.read()
}

object PipelineRunner {

  /** Pure batch-hook body, shared by streaming foreachBatch and batch-mode
    * runs: filter chain → route → per-key last-writer-wins → sink.
    */
  def applyBatch(plan: PipelinePlan, sink: BatchSink)(df: DataFrame, batchId: Long): Unit = {
    val transformed = TransformChain(plan.transforms)(df)
    val routed = plan.router.map(r => r.assign(transformed.filter(r.exists)))
      .getOrElse(transformed)
    // REPLACE batches only need the final image per key
    // (pkg/sql_execution_engine/mysql_replace_engine.go:59-88)
    val compacted = ChangeLog.lastPerKey(routed, plan.pkCols)
    sink.write(batchId, compacted)
  }

  /** Launch the streaming query. */
  def start(plan: PipelinePlan, source: DataFrame, sink: BatchSink,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    source.writeStream
      .queryName(plan.name)
      .option("checkpointLocation", plan.checkpoint)
      .trigger(trigger)
      .foreachBatch(applyBatch(plan, sink) _)
      .start()

  /** One-shot batch mode over a static change-log (backfill path). */
  def runBatch(plan: PipelinePlan, source: DataFrame, sink: BatchSink): Unit =
    applyBatch(plan, sink)(source, -1L)
}
