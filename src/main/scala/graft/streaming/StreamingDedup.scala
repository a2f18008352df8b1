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
}
