package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming half of the data-consistency profiler: the dcp checker's
  * barrier-matched segment compare (dcp/checker/checker.go:11-150;
  * buffer.go segments a tagged stream at barrier messages; segment.go
  * compares per-payload-id checksum lists) re-expressed on Structured
  * Streaming primitives:
  *
  *   - a BARRIER is an event-time boundary: barrier index n becomes event
  *     time n s, and a segment is the 1 s window [n, n+1)
  *   - SEGMENT CLOSE is the watermark passing the window end — exactly
  *     when dcp's buffer sees the next barrier message (the catalog entry
  *     feeds a literal barrier-close sentinel at maxBarrier+1 to flush)
  *   - the TIMEOUT is the watermark horizon: a target segment that
  *     hasn't arrived by the time the watermark closes its window is
  *     reported `timeout`, like checker.go's time.After branch — its
  *     stragglers are late rows and stay dropped
  *
  * State is bounded by (open windows × payload ids in flight), the same
  * bound dcp's in-memory buffers have per un-closed barrier — but here it
  * is partitioned across executors and spills via the state store instead
  * of living on one checker goroutine.
  */
object StreamConsistency {

  /** STREAMING stage: tagged messages → per-(segment, payload, tag)
    * ordered checksum lists, emitted append-mode as the watermark closes
    * each segment. Input columns: tag string, barrier long, payload_id
    * string, ord long (intra-id order, dcp sorts by timestamp+id),
    * checksum string.
    */
  def segmentChecks(tagged: DataFrame): DataFrame =
    tagged
      .withColumn("bts", timestamp_seconds(col("barrier")))
      .withWatermark("bts", "0 seconds")
      .groupBy(window(col("bts"), "1 second"),
        col("payload_id"), col("tag"))
      .agg(sort_array(collect_list(struct(col("ord"), col("checksum")))).as("msgs"))
      .select(col("window.start").cast("long").as("segment"),
        col("payload_id"), col("tag"),
        expr("transform(msgs, m -> m.checksum)").as("checks"))

  /** BATCH stage over the emitted segment checks: per-segment verdict for
    * one target tag vs the source tag — Same / Diff / Timeout, with the
    * mismatch breakdown (missing / extra payload ids, differing lists).
    */
  def verdicts(checks: DataFrame, sourceTag: String, targetTag: String): DataFrame = {
    val src = checks.filter(col("tag") === sourceTag)
      .select(col("segment"), col("payload_id"), col("checks").as("src_checks"))
    // right side's keys renamed: both branches may scan the SAME relation
    // instance (a memory-sink view self-join has conflicting attribute
    // ids under plain using-column joins)
    val dst = checks.filter(col("tag") === targetTag)
      .select(col("segment").as("d_segment"), col("payload_id").as("d_payload_id"),
        col("checks").as("dst_checks"))
    src.join(dst,
        col("segment") <=> col("d_segment") &&
          col("payload_id") <=> col("d_payload_id"), "full_outer")
      .select(coalesce(col("segment"), col("d_segment")).as("segment"),
        col("src_checks"), col("dst_checks"))
      .groupBy(col("segment"))
      .agg(
        count(col("src_checks")).as("n_ids"),
        count(col("dst_checks")).as("n_target"),
        count(when(col("src_checks").isNotNull && col("dst_checks").isNull, 1)).as("n_missing"),
        count(when(col("src_checks").isNull && col("dst_checks").isNotNull, 1)).as("n_extra"),
        count(when(col("src_checks").isNotNull && col("dst_checks").isNotNull &&
          col("src_checks") =!= col("dst_checks"), 1)).as("n_diff"))
      .select(col("segment"), col("n_ids"), col("n_target"),
        col("n_missing"), col("n_extra"), col("n_diff"),
        when(col("n_target") === 0 && col("n_ids") > 0, "timeout")
          .when(col("n_missing") + col("n_extra") + col("n_diff") === 0, "same")
          .otherwise("diff").as("status"))
  }
}
