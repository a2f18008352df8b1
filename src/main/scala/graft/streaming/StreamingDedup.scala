package graft.streaming

import graft.functions.{GraftFunctions, Similarity}
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Streaming near-dup candidate detection: the batch MinHash-LSH band
  * join (`ddp_minhash_lsh_pairs`) as an INCREMENTAL operator on the
  * arbitrary-stateful-v2 API (transformWithState), so a live document
  * feed gets dedup decisions at ingest time instead of in a nightly
  * batch — the streaming half of the reference's replicate-then-process
  * posture (gravity moves rows continuously; pkg/core/msg.go) applied
  * to the training-data extension surface.
  *
  * Shape: stateless projection computes the SAME 9-permutation MinHash
  * signature and 3-row band keys as the batch entry (bit-identical —
  * native MinHashHex + the same md5 band fold), then state per band
  * bucket holds member doc ids; each new doc emits a candidate pair
  * against every existing member and joins the bucket. The cumulative
  * emitted-pair SET equals the batch band self-join regardless of
  * arrival order or batching (asserted by spec).
  *
  * Scale: state per bucket is duplicate-cluster-sized — LSH bits are
  * sized so expected bucket size stays O(1) (bits ≈ log2(N/target)),
  * and `maxBucket` caps the degenerate hot bucket (a stopword-like
  * band key): past the cap a doc still joins candidates against the
  * retained members but stops growing the list — the overflow tail is
  * handed to the nightly batch join, the standard hybrid guard.
  */
class BandBucketProcessor(maxBucket: Int = 64)
    extends StatefulProcessor[String, (String, Long), (Long, Long)] {
  @transient private var members: ListState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    members = getHandle.getListState[Long](
      "members", Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(
      key: String,
      rows: Iterator[(String, Long)],
      timerValues: TimerValues): Iterator[(Long, Long)] = {
    val existing = scala.collection.mutable.TreeSet.empty[Long]
    members.get().foreach(existing += _)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    rows.foreach { case (_, doc) =>
      if (!existing.contains(doc)) { // replayed doc: no duplicate pairs
        existing.foreach { m =>
          out += (if (m < doc) (m, doc) else (doc, m))
        }
        if (existing.size < maxBucket) {
          existing += doc
          members.appendValue(doc)
        } else {
          existing += doc // pairs within this batch still dedupe
        }
      }
    }
    out.iterator
  }
}

/** [[BandBucketProcessor]] plus EVENT-TIME HORIZON EVICTION: each member
  * carries its event-time millis, and members older than
  * `watermark - horizonMs` are dropped before pairing — so over an
  * unbounded stream a bucket's state is bounded by (docs inside the
  * horizon) ∧ maxBucket, instead of growing for the stream's lifetime.
  * The contract weakens exactly as intended: pairs are emitted iff both
  * docs fall within the horizon of each other's arrival (a near-dup
  * against a years-old doc is the nightly batch join's job; the stream
  * answers "seen recently?"). Eviction is driven by the QUERY watermark
  * (TimeMode.EventTime), not per-bucket maxima, so idle buckets drain as
  * the global watermark advances past their members too.
  */
class BandBucketExpiringProcessor(maxBucket: Int, horizonMs: Long)
    extends StatefulProcessor[String, (String, Long, Long), (Long, Long)] {
  @transient private var members: ListState[(Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    members = getHandle.getListState[(Long, Long)](
      "members", Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong),
      TTLConfig.NONE)

  override def handleInputRows(
      key: String,
      rows: Iterator[(String, Long, Long)],
      timerValues: TimerValues): Iterator[(Long, Long)] = {
    // watermark is -1/0 before any batch establishes one: evict nothing
    val wm = timerValues.getCurrentWatermarkInMs()
    val threshold = if (wm <= 0L) Long.MinValue else wm - horizonMs
    val kept = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    var hadEviction = false
    members.get().foreach { m =>
      if (m._2 >= threshold) kept += m else hadEviction = true
    }
    val existing = scala.collection.mutable.TreeSet.empty[Long]
    kept.foreach(existing += _._1)
    val appended = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    rows.foreach { case (_, doc, ems) =>
      if (!existing.contains(doc)) {
        existing.foreach { m =>
          out += (if (m < doc) (m, doc) else (doc, m))
        }
        if (existing.size < maxBucket) {
          existing += doc
          appended += ((doc, ems))
        } else {
          existing += doc
        }
      }
    }
    // a rewrite is only paid when something actually expired; the steady
    // state is append-only, same as the non-expiring processor
    if (hadEviction) members.put((kept ++ appended).toArray)
    else appended.foreach(members.appendValue)
    out.iterator
  }
}

object StreamingDedup {

  /** (bucket, doc_id) band keys — the same derivation (and therefore the
    * same md5 band keys) as the batch `ddp_minhash_lsh_pairs`, expressed
    * as a stateless projection so it runs on a streaming frame. The band
    * index is folded into the bucket key (batch joins on band AND key).
    */
  def bandKeys(docs: DataFrame): Dataset[(String, Long)] = {
    val sp = docs.sparkSession
    import sp.implicits._
    docs.select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), expr(Similarity.shinglesFromToks("toks")).as("sh"))
      .select(col("doc_id"), GraftFunctions.minhash_hex(col("sh"), 9).as("sig"))
      .select(col("doc_id"), posexplode(expr(
        """transform(sequence(0, 2), j -> md5(concat(
          | element_at(sig, 3 * CAST(j AS INT) + 1),
          | element_at(sig, 3 * CAST(j AS INT) + 2),
          | element_at(sig, 3 * CAST(j AS INT) + 3))))""".stripMargin)))
      .select(concat(col("pos").cast("string"), lit(":"), col("col"))
        .as("bucket"), col("doc_id"))
      .as[(String, Long)]
  }

  /** Candidate pairs (doc_a < doc_b) from a streaming document frame;
    * pairs may repeat across bands — consumers `distinct` (exactly like
    * the batch entry does).
    */
  def candidatePairs(docs: DataFrame, maxBucket: Int = 64): Dataset[(Long, Long)] = {
    val sp = docs.sparkSession
    import sp.implicits._
    bandKeys(docs)
      .groupByKey(_._1)
      .transformWithState(new BandBucketProcessor(maxBucket),
        TimeMode.None(), OutputMode.Update())
  }

  /** Band keys carrying each doc's event-time millis (docs: doc_id, text,
    * ts timestamp) — the projection feeding the expiring processor.
    */
  def bandKeysWithTs(docs: DataFrame): Dataset[(String, Long, Long)] = {
    val sp = docs.sparkSession
    import sp.implicits._
    docs.select(col("doc_id"), split(col("text"), " ").as("toks"),
        unix_millis(col("ts")).as("ems"))
      .select(col("doc_id"), expr(Similarity.shinglesFromToks("toks")).as("sh"), col("ems"))
      .select(col("doc_id"), GraftFunctions.minhash_hex(col("sh"), 9).as("sig"), col("ems"))
      .select(col("doc_id"), col("ems"), posexplode(expr(
        """transform(sequence(0, 2), j -> md5(concat(
          | element_at(sig, 3 * CAST(j AS INT) + 1),
          | element_at(sig, 3 * CAST(j AS INT) + 2),
          | element_at(sig, 3 * CAST(j AS INT) + 3))))""".stripMargin)))
      .select(concat(col("pos").cast("string"), lit(":"), col("col"))
        .as("bucket"), col("doc_id"), col("ems"))
      .as[(String, Long, Long)]
  }

  /** Candidate pairs with BOUNDED state over an unbounded stream: docs
    * need a `ts` event-time column; `delay` is the watermark delay and
    * `horizonMs` the dedup lookback. State per bucket is capped by both
    * the horizon (members older than watermark - horizon evicted) and
    * `maxBucket`. Pairs inside the horizon match the batch join on the
    * same window; pairs across the horizon are intentionally not emitted.
    */
  def expiringCandidatePairs(docs: DataFrame, delay: String, horizonMs: Long,
      maxBucket: Int = 64): Dataset[(Long, Long)] = {
    val sp = docs.sparkSession
    import sp.implicits._
    bandKeysWithTs(docs.withWatermark("ts", delay))
      .groupByKey(_._1)
      .transformWithState(new BandBucketExpiringProcessor(maxBucket, horizonMs),
        TimeMode.EventTime(), OutputMode.Update())
  }
}
