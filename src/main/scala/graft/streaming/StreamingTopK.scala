package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Streaming heavy hitters: the SPACE-SAVING sketch (Metwally/Agrawal/
  * El Abbadi, ICDT'05 — the Stream-Summary algorithm) per group key on
  * transformWithState, so a live event feed answers "top items right
  * now" with O(capacity) state per group instead of a per-item counter
  * table that grows with the key universe.
  *
  * Contract (the textbook bounds, asserted by spec):
  *   - est(x) ≥ true(x) (counts never undercount);
  *   - est(x) − err(x) ≤ true(x) (the error term brackets the truth);
  *   - any item with true frequency > n/capacity IS in the sketch
  *     (no false negatives for true heavy hitters);
  *   - state per group never exceeds `capacity` entries.
  * When capacity ≥ the group's distinct-item count the sketch degrades
  * to exact counting (err = 0 everywhere) — the regime the oracle
  * entry pins hash-exactly against plain GROUP BY counts, while the
  * spec exercises the lossy regime (capacity 8) and checks the bounds.
  *
  * Scale: the reference posture for "top pages / hot keys right now" at
  * 100 TB/day — per-group state is config-bounded (capacity entries of
  * (item, count, err)), eviction is O(capacity) scan at the rare
  * map-full boundary, and the emitted snapshot is per-batch UPDATE of
  * the groups that received rows (idle groups emit nothing — their last
  * snapshot stands, which the assembling entry exploits via
  * last-emission-per-group).
  */
class SpaceSavingProcessor(capacity: Int)
    extends StatefulProcessor[String, (String, Long), (String, Long, Long, Long)] {
  @transient private var counters: MapState[Long, (Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    counters = getHandle.getMapState[Long, (Long, Long)](
      "counters", Encoders.scalaLong,
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong), TTLConfig.NONE)

  override def handleInputRows(
      key: String,
      rows: Iterator[(String, Long)],
      timerValues: TimerValues): Iterator[(String, Long, Long, Long)] = {
    // state is capacity-bounded, so one in-memory pass per batch is safe
    val m = scala.collection.mutable.HashMap.empty[Long, (Long, Long)]
    counters.iterator().foreach { case (i, ce) => m(i) = ce }
    rows.foreach { case (_, item) =>
      m.get(item) match {
        case Some((c, e)) => m(item) = (c + 1, e)
        case None if m.size < capacity => m(item) = (1L, 0L)
        case None =>
          // evict the minimum-count entry (item id breaks ties so replay
          // is deterministic); the newcomer inherits its count as error
          val (minItem, (minC, _)) =
            m.minBy { case (i, (c, _)) => (c, i) }
          m.remove(minItem)
          counters.removeKey(minItem)
          m(item) = (minC + 1, minC)
      }
    }
    m.foreach { case (i, ce) => counters.updateValue(i, ce) }
    m.iterator.map { case (i, (c, e)) => (key, i, c, e) }
  }
}

object StreamingTopK {

  /** Assemble the streaming query: (group, item) rows → per-batch sketch
    * snapshots (group, item, est, err). Update-mode semantics: only
    * groups that received rows in a batch re-emit; the caller keeps each
    * group's LAST emission (cumulative state makes it total).
    */
  def sketch(events: DataFrame, capacity: Int): Dataset[(String, Long, Long, Long)] = {
    val s = events.sparkSession
    import s.implicits._
    events.selectExpr("CAST(grp AS STRING) AS grp", "CAST(item AS BIGINT) AS item")
      .as[(String, Long)]
      .groupByKey(_._1)
      .transformWithState(new SpaceSavingProcessor(capacity),
        TimeMode.None(), OutputMode.Update())
  }
}
