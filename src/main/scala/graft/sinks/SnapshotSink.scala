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
  * One pk-shuffle per batch; snapshot stays pk-clustered, so at scale
  * this is the standard copy-on-write LWW merge (what table formats do).
  */
final class SnapshotSink(spark: SparkSession, path: String, pkCols: Seq[String]) {

  def exists: Boolean =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .exists(new org.apache.hadoop.fs.Path(path))

  /** Live rows (tombstones and bookkeeping hidden). */
  def read(): DataFrame =
    readInternal().filter(!col("__deleted")).drop("__seq", "__deleted")

  /** Full state including tombstones. */
  def readInternal(): DataFrame = spark.read.parquet(path)

  /** Apply one change batch (typed log with op/seq) to the snapshot. */
  def merge(batch: DataFrame): Unit = {
    val dataCols = batch.columns.filterNot(c => c == "op" || c == "seq").toSeq
    val normalized = batch.select(
      (dataCols.map(col) :+ col("seq").as("__seq") :+
        (col("op") === ChangeLog.Delete).as("__deleted")): _*)
    val incoming = if (!exists) normalized else readInternal().unionByName(normalized)
    val next = ChangeLog.lastPerKey(incoming, pkCols, seqCol = "__seq")
    // write-then-swap: parquet can't read+overwrite the same path in one job
    val tmp = path + ".staging"
    next.write.mode(SaveMode.Overwrite).parquet(tmp)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(path)
    if (fs.exists(dst)) fs.delete(dst, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
  }
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
}
