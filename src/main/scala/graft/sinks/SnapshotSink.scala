package graft.sinks

import graft.core.ChangeLog
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet snapshot sink: maintains a materialized table from change
  * batches — the harness-friendly stand-in for an upsert-capable store
  * (what gravity's MySQL output does against the target DB).
  *
  * The snapshot internally keeps `__seq` and `__deleted` per key
  * (tombstones). Merging is last-writer-wins BY SEQUENCE, not by arrival:
  * a late-arriving lower-seq change can never resurrect a deleted key or
  * roll back a newer image. This makes batch application commutative and
  * idempotent — exactly what out-of-order / replayed delivery on a big
  * cluster requires (and what the reference's per-key latch ordering
  * guarantees row-at-a-time, batch_table_scheduler.go:61-73).
  *
  * Layout: pk-hash bucketed (`__bucket = pmod(xxhash64(pk), numBuckets)`
  * partition directories). A merge reads and rewrites ONLY the buckets the
  * batch touches — at 100 TB a micro-batch touching k of N buckets costs
  * O(k/N) of the snapshot, not a full-table rewrite. Each bucket swaps
  * crash-safely (live → backup, staging → live, drop backup; `recover()`
  * heals interrupted swaps and stale staging on the next call). Swaps are
  * atomic per bucket, not across buckets: a crash mid-merge leaves some
  * buckets a batch ahead, and the foreachBatch replay re-merges the same
  * batch — idempotent by seq-LWW — converging all buckets.
  */
final class SnapshotSink(spark: SparkSession, path: String, pkCols: Seq[String],
    numBuckets: Int = 16) {

  private val stagingPath = path + ".staging"
  private val backupPath = path + ".backup"

  /** merge() and read()/readInternal() are serialized on this: a read
    * arriving mid-swap must not run recover() while the merge is still
    * swapping buckets (recover would restore a backup bucket under the
    * merge's feet and the subsequent stag→live rename would fail).
    * Keyed by PATH and JVM-global — readers routinely construct their own
    * SnapshotSink over the same directory, and a per-instance monitor
    * would not serialize them against the writer's instance.
    * Cross-process single-writer is the streaming-checkpoint contract
    * (one foreachBatch writer per sink path), same as the reference's
    * single scheduler per output.
    */
  private val swapLock = SnapshotSink.lockFor(path)

  private def hfs = new org.apache.hadoop.fs.Path(path)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def p(s: String) = new org.apache.hadoop.fs.Path(s)

  /** HDFS rename reports failure by returning false, not by throwing —
    * an unchecked swap rename would silently drop the batch's changes for
    * that bucket while foreachBatch still commits the offset. Throwing
    * makes the batch fail and retry (idempotent by seq-LWW).
    */
  private def renameOrFail(fs: org.apache.hadoop.fs.FileSystem,
      src: org.apache.hadoop.fs.Path, dst: org.apache.hadoop.fs.Path): Unit =
    if (!fs.rename(src, dst))
      sys.error(s"snapshot swap rename failed: $src -> $dst")

  def exists: Boolean = hfs.exists(p(path))

  private def bucketCol = pmod(xxhash64(pkCols.map(col): _*), lit(numBuckets)).cast("int")

  /** Live rows (tombstones and bookkeeping hidden). */
  def read(): DataFrame =
    readInternal().filter(!col("__deleted")).drop("__seq", "__deleted", "__bucket")

  /** Full state including tombstones and bucket ids. Recovers first: a
    * reader arriving after a crash mid-swap must not silently serve a
    * snapshot with a bucket sitting in .backup.
    */
  def readInternal(): DataFrame = swapLock.synchronized {
    recover()
    spark.read.parquet(path)
  }

  /** Heal an interrupted swap: a bucket sitting in backup with no live
    * twin is restored; completed swaps drop their backup; stale staging
    * from a crashed write is removed.
    */
  def recover(): Unit = {
    val fs = hfs
    if (fs.exists(p(backupPath))) {
      fs.listStatus(p(backupPath)).foreach { st =>
        val live = new org.apache.hadoop.fs.Path(p(path), st.getPath.getName)
        if (!fs.exists(live)) renameOrFail(fs, st.getPath, live)
        else fs.delete(st.getPath, true)
      }
      fs.delete(p(backupPath), true)
    }
    if (fs.exists(p(stagingPath))) fs.delete(p(stagingPath), true)
  }

  /** Batch-id-guarded merge — the foreachBatch idempotent-sink pattern
    * the Structured Streaming guide prescribes: the batch id is recorded
    * in a marker directory AFTER the merge completes, and a replay of an
    * already-applied id is a no-op EVEN IF the replayed DataFrame would
    * compute different rows (a retraction/delta stream whose inputs read
    * state that has since advanced — seq-LWW alone only makes
    * identical-row replays convergent). Returns true iff the batch was
    * applied. The residual window (merge committed, marker not yet
    * written, crash) degrades to the plain seq-LWW replay contract;
    * closing it entirely needs the marker inside the same atomic swap —
    * a commit log, the documented production step.
    */
  def mergeOnce(batchId: Long, batch: DataFrame): Boolean = swapLock.synchronized {
    val fs = hfs
    val marker = p(s"$path.applied/$batchId")
    if (fs.exists(marker)) false
    else {
      merge(batch)
      fs.mkdirs(marker)
      true
    }
  }

  /** Apply one change batch (typed log with op/seq) to the snapshot. */
  def merge(batch: DataFrame): Unit = swapLock.synchronized {
    recover()
    val dataCols = batch.columns.filterNot(c => c == "op" || c == "seq").toSeq
    val normalized = batch.select(
      (dataCols.map(col) :+ col("seq").as("__seq") :+
        (col("op") === ChangeLog.Delete).as("__deleted")): _*)
      .withColumn("__bucket", bucketCol)
    val fs = hfs
    if (!exists) {
      val next = ChangeLog.lastPerKey(normalized, pkCols, seqCol = "__seq")
      next.write.mode(SaveMode.Overwrite).partitionBy("__bucket").parquet(stagingPath)
      renameOrFail(fs, p(stagingPath), p(path))
      return
    }
    // touched bucket ids: bounded by numBuckets, driver-safe to collect
    val touched = normalized.select(col("__bucket")).distinct()
      .collect().map(_.getInt(0)).sorted
    if (touched.isEmpty) return
    // partition pruning keeps the read to the touched directories only
    val existing = readInternal()
      .filter(col("__bucket").isin(touched.map(Int.box): _*))
    val next = ChangeLog.lastPerKey(
      existing.unionByName(normalized), pkCols, seqCol = "__seq")
    next.write.mode(SaveMode.Overwrite).partitionBy("__bucket").parquet(stagingPath)
    fs.mkdirs(p(backupPath))
    touched.foreach { b =>
      val dir = s"__bucket=$b"
      val live = new org.apache.hadoop.fs.Path(p(path), dir)
      val stag = new org.apache.hadoop.fs.Path(p(stagingPath), dir)
      val bak = new org.apache.hadoop.fs.Path(p(backupPath), dir)
      if (fs.exists(live)) renameOrFail(fs, live, bak)
      if (fs.exists(stag)) renameOrFail(fs, stag, live)
      if (fs.exists(bak)) fs.delete(bak, true)
    }
    fs.delete(p(backupPath), true)
    fs.delete(p(stagingPath), true)
  }
}

object SnapshotSink {
  private val locks =
    scala.collection.concurrent.TrieMap.empty[String, Object]
  private def lockFor(path: String): Object =
    locks.getOrElseUpdate(path, new Object)
}

/** Elasticsearch-shaped sink helpers: the reference bulk-upserts with
  * docID = PK values joined (pkg/outputs/elasticsearch/helper.go:12-21)
  * and index from route or table. Without an ES cluster in the harness,
  * the document assembly is the testable part; transport is an SPI.
  */
object EsDocs {
  /** (docId, index, json) frame ready for a bulk writer. */
  def assemble(df: DataFrame, pkCols: Seq[String], payloadCols: Seq[String]): DataFrame =
    df.select(
      concat_ws("_", pkCols.map(col): _*).as("doc_id"),
      col("tgt_index").as("index"),
      to_json(struct(payloadCols.map(col): _*)).as("doc"),
      col("op"))

  /** EsModel nested one-many assembly (pkg/outputs/routers/esmodel_router.go:
    * 24-59): child rows aggregated into an array inside the parent doc —
    * the Spark-native replacement for per-doc painless-script upserts is a
    * grouped rebuild: one shuffle by FK, then a broadcast-or-shuffle join.
    */
  def nestedOneMany(parent: DataFrame, child: DataFrame, fk: String,
      parentKey: String, childArrayField: String): DataFrame = {
    val nested = child.groupBy(col(fk))
      .agg(collect_list(struct(child.columns.filterNot(_ == fk).map(col): _*))
        .as(childArrayField))
    parent.join(nested, parent(parentKey) === nested(fk), "left").drop(fk)
  }

  /** EsModel one-one sub-route: child columns merged into the parent doc
    * under a prefix (esmodel_router.go one-one PropertyPre mode) — a left
    * join with renamed columns.
    */
  def nestedOneOne(parent: DataFrame, child: DataFrame, fk: String,
      parentKey: String, prefix: String): DataFrame = {
    val renamed = child.columns.filterNot(_ == fk).foldLeft(child) { (d, c) =>
      d.withColumnRenamed(c, s"$prefix$c")
    }
    parent.join(renamed, parent(parentKey) === renamed(fk), "left").drop(fk)
  }

  /** Route column maps (esmodel_router.go:121-179): `include` whitelists
    * doc columns (empty = all), `exclude` blacklists, `convert` renames
    * source column → ES field name. Applied in that order, matching the
    * router's per-column selection before doc assembly.
    */
  def applyColumnMaps(df: DataFrame, include: Seq[String] = Nil,
      exclude: Seq[String] = Nil, convert: Map[String, String] = Map.empty): DataFrame = {
    val included =
      if (include.isEmpty) df.columns.toSeq
      else df.columns.toSeq.filter(include.contains)
    val kept = included.filterNot(exclude.contains)
    df.select(kept.map(c => col(c).as(convert.getOrElse(c, c))): _*)
  }

  /** Incremental child-state maintenance for one-many arrays. The
    * reference keeps the child array inside each parent doc current with
    * three painless scripts — insert/update/delete a child BY KEY within
    * the array (pkg/outputs/esmodel/esmodel.go:23-71). Batch-shaped
    * equivalent: a seq-LWW child state WITH tombstones; a deleted child
    * stays tombstoned, so no later rebuild can resurrect it.
    */
  def mergeChildState(state: DataFrame, batch: DataFrame, childKey: String): DataFrame =
    graft.core.ChangeLog.lastPerKey(state.unionByName(batch), Seq(childKey))

  /** Rebuild child arrays ONLY for the parents the batch touched — the
    * incremental twin of [[nestedOneMany]]: each touched parent gets one
    * update row carrying its full current array (empty when its last
    * child was deleted — the script-delete equivalent). Untouched parents
    * produce no write at all, so the work is O(batch), not O(parents).
    */
  def childArrayUpdates(childState: DataFrame, batch: DataFrame, fk: String,
      childArrayField: String): DataFrame = {
    val touched = batch.select(col(fk)).distinct()
    val payload = childState.columns
      .filterNot(c => c == fk || c == "op" || c == "seq").toSeq
    // restrict to touched parents BEFORE aggregating: the rebuild is
    // O(children of touched parents), never a scan of the full state
    val live = childState.filter(col("op") =!= graft.core.ChangeLog.Delete)
      .join(touched, Seq(fk))
    val rebuilt = live.groupBy(col(fk))
      .agg(collect_list(struct(payload.map(col): _*)).as(childArrayField))
    touched.join(rebuilt, Seq(fk), "left")
      .withColumn(childArrayField,
        coalesce(col(childArrayField),
          expr(s"CAST(array() AS ${rebuilt.schema(childArrayField).dataType.sql})")))
  }
}
