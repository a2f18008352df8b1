package graft.streaming

import graft.functions.QSketchBuf
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming percentiles: the mergeable KLL-style sketch
  * (functions.QSketchBuf — the same buffer the batch
  * `quantile_sketch` aggregate exchanges) held per group key in
  * transformWithState ValueState, so a live feed answers "p50/p99
  * right now" with O(k·log(n/k)) state per group instead of a
  * per-value history.
  *
  * Contract (the batch aggregate's split, carried to streaming):
  *  - k ≥ the group's running cardinality → the sketch is the exact
  *    multiset; the last emission equals the batch discrete quantiles
  *    over everything seen — the regime the oracle entry pins.
  *  - k ≪ n → state stays O(k·log(n/k)) per group over an unbounded
  *    stream; answers carry the ε rank-error bound (spec-driven).
  *
  * Update-mode semantics like StreamingTopK: groups that received rows
  * re-emit their snapshot; idle groups' last emission stands.
  */
class QuantileSketchProcessor(k: Int, probes: Seq[Double])
    extends StatefulProcessor[String, (String, Long), (String, Long, Seq[Long])] {
  @transient private var sketch: ValueState[Array[Byte]] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    sketch = getHandle.getValueState[Array[Byte]](
      "sketch", Encoders.BINARY, TTLConfig.NONE)

  override def handleInputRows(
      key: String,
      rows: Iterator[(String, Long)],
      timerValues: TimerValues): Iterator[(String, Long, Seq[Long])] = {
    val buf =
      if (sketch.exists()) QSketchBuf.fromBytes(k, sketch.get())
      else new QSketchBuf(k)
    rows.foreach { case (_, v) => buf.insert(v) }
    sketch.update(QSketchBuf.toBytes(buf))
    Iterator.single((key, buf.count, buf.quantiles(probes).toSeq))
  }
}

object StreamingQuantiles {

  /** Assemble the streaming query: (grp, v) rows → per-batch snapshot
    * (grp, n, quantiles at `probes`). */
  def sketch(events: DataFrame, k: Int, probes: Seq[Double])
      : Dataset[(String, Long, Seq[Long])] = {
    val s = events.sparkSession
    import s.implicits._
    events.selectExpr("CAST(grp AS STRING) AS grp", "CAST(v AS BIGINT) AS v")
      .as[(String, Long)]
      .groupByKey(_._1)
      .transformWithState(new QuantileSketchProcessor(k, probes),
        TimeMode.None(), OutputMode.Update())
  }
}
