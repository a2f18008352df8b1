package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Change-log and snapshot sources.
  *
  * Production CDC tails (binlog/oplog/Kafka) are separate deployments of
  * the same shape: a stream of envelope rows with (seq, op, payload) and a
  * checkpointable offset. The harness uses file-backed change-logs —
  * Structured Streaming's file source provides exactly the offset/commit
  * semantics gravity implements by hand with its position store
  * (SURVEY §2.7: checkpoint dir ≡ `_gravity.gravity_positions`).
  */
object FileChangeLogSource {
  /** Batch read of a change-log directory. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Streaming read; `maxFilesPerTrigger` bounds micro-batch size the way
    * gravity's scan rate limit bounds batches/second
    * (/root/reference pkg/inputs/mysqlbatch/input.go:206-208).
    */
  def readStream(spark: SparkSession, path: String, schema: StructType,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val r = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => r.option("maxFilesPerTrigger", n))
    r.parquet(path)
  }
}

/** Keyset-chunked relational scan planning — the reference's mysqlbatch
  * input (pkg/inputs/mysqlbatch/mysql_table_scanner.go:581-649) paginates
  * `WHERE k >= ? ORDER BY k LIMIT n`; Spark's JDBC partitioned read takes
  * the same idea as a predicate array, one partition per chunk, executed
  * in parallel by executors (no OFFSET, no driver paging).
  */
object JdbcChunkedSource {

  /** Plan numeric keyset chunks [min,max] → WHERE predicates, one per
    * partition. Mirrors scan-column detection defaults: caller picks the
    * PK / single unique key as `column`
    * (pkg/inputs/mysqlbatch/input.go:462-489).
    */
  def numericPredicates(column: String, min: Long, max: Long, chunks: Int): Seq[String] = {
    require(chunks > 0 && max >= min)
    val span = max - min + 1
    val per = math.max(1L, (span + chunks - 1) / chunks)
    (0 until chunks).flatMap { i =>
      val lo = min + i * per
      val hi = math.min(max, lo + per - 1)
      if (lo > max) None
      else if (i == chunks - 1 || hi == max)
        Some(s"$column >= $lo AND $column <= $max")
      else Some(s"$column >= $lo AND $column <= $hi")
    }.distinct
  }

  /** Quantile-based chunking for skewed keys — the analogue of mongo's
    * `$bucketAuto` chunking (pkg/inputs/mongobatch/position_value.go:214-282):
    * approxQuantile on a sampled frame yields near-equal-row chunks.
    */
  def quantilePredicates(df: DataFrame, column: String, chunks: Int): Seq[String] = {
    val probs = (1 until chunks).map(_.toDouble / chunks).toArray
    val qs = df.stat.approxQuantile(column, probs, 0.01).distinct.sorted
    val bounds = qs.map(_.toLong)
    val lowers = Long.MinValue +: bounds
    val uppers = bounds :+ Long.MaxValue
    lowers.zip(uppers).map { case (lo, hi) =>
      val loP = if (lo == Long.MinValue) "" else s"$column > $lo"
      val hiP = if (hi == Long.MaxValue) "" else s"$column <= $hi"
      Seq(loP, hiP).filter(_.nonEmpty).mkString(" AND ") match {
        case "" => "1=1"
        case p  => p
      }
    }
  }

  /** Partitioned JDBC read with planned predicates. */
  def read(spark: SparkSession, url: String, table: String,
      predicates: Seq[String], props: java.util.Properties): DataFrame =
    spark.read.jdbc(url, table, predicates.toArray, props)
}

/** Two-stage input (backfill then tail) — reference `mysql` replication
  * mode (pkg/inputs/mysql/input.go:26-68, helper/two_stage_input.go:82-147):
  * snapshot rows become seq=0 inserts, the change stream starts from the
  * position captured *before* the scan, and last-writer-wins compaction
  * absorbs the overlap (re-applied changes win by seq).
  */
object TwoStageSource {
  def backfillAsChangeLog(snapshot: DataFrame): DataFrame =
    snapshot
      .withColumn("op", lit("insert"))
      .withColumn("seq", lit(0L))

  /** Batch-mode union of backfill + captured change-log (the streaming
    * variant feeds the same union through foreachBatch).
    */
  def apply(snapshot: DataFrame, changes: DataFrame): DataFrame =
    backfillAsChangeLog(snapshot).unionByName(changes)
}
