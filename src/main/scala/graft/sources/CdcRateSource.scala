package graft.sources

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, SupportsTriggerAvailableNow}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A REAL DataSourceV2 `MicroBatchStream` CDC source — the custom-source
  * seat SURVEY §4 calls out ("offsets = GTID/file-pos/oplog-ts"): the
  * production shape a binlog/oplog tailer plugs into, exercised here with
  * a deterministic generator so offset semantics are testable without a
  * database. The reference's positionCache + sliding-window commit
  * machinery (pkg/position_cache, pkg/sliding_window) maps to exactly
  * this API: `latestOffset` = what the tailer has, `planInputPartitions
  * (start, end)` = the change range of one micro-batch, checkpointed
  * offsets = the durable position, `commit` = the ack.
  *
  * Options: `maxSeq` (stream ends; bounded like a backfill), `rowsPerBatch`
  * (micro-batch size ≙ scan rate limit), `numKeys`, `partitions`.
  * Emits the typed envelope (seq, op, database, table, id, v): op cycles
  * insert/update/delete deterministically per seq, so every run and every
  * resume-from-checkpoint produces the identical change-log.
  *
  * Usage: `spark.readStream.format("graft.sources.CdcRateSource").load()`.
  */
class CdcRateSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    CdcRateSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new CdcRateTable(new CaseInsensitiveStringMap(properties))
}

object CdcRateSource {
  val schema: StructType = StructType(Seq(
    StructField("seq", LongType, nullable = false),
    StructField("op", StringType, nullable = false),
    StructField("database", StringType, nullable = false),
    StructField("table", StringType, nullable = false),
    StructField("id", LongType, nullable = false),
    StructField("v", StringType, nullable = false)))

  /** Deterministic row for a sequence number (shared by all readers). */
  def rowFor(seq: Long, numKeys: Long): InternalRow = {
    val op = (seq % 10) match {
      case 7 | 8 => "update"
      case 9 => "delete"
      case _ => "insert"
    }
    InternalRow(
      seq,
      UTF8String.fromString(op),
      UTF8String.fromString("db" + (seq % 2)),
      UTF8String.fromString("t"),
      seq % numKeys,
      UTF8String.fromString(s"v$seq"))
  }
}

final case class CdcOffset(seq: Long) extends Offset {
  override def json(): String = s"""{"seq":$seq}"""
}

final class CdcRateTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = "graft-cdc-rate"
  override def schema(): StructType = CdcRateSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = CdcRateSource.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new CdcRateStream(
            maxSeq = options.getLong("maxSeq", 1000L),
            rowsPerBatch = options.getLong("rowsPerBatch", 100L),
            numKeys = options.getLong("numKeys", 10L),
            numPartitions = options.getInt("partitions", 2))
      }
    }
}

final class CdcRateStream(maxSeq: Long, rowsPerBatch: Long, numKeys: Long,
    numPartitions: Int) extends MicroBatchStream with SupportsTriggerAvailableNow {

  // the "tailer position": what the source could serve right now. With
  // AvailableNow the whole bounded range is the target (backfill shape);
  // otherwise each poll advances by rowsPerBatch (rate-limit shape).
  private var available: Long = 0L
  private var availableNow = false

  override def prepareForTriggerAvailableNow(): Unit = { availableNow = true }
  override def reportLatestOffset(): Offset = CdcOffset(maxSeq)

  override def initialOffset(): Offset = CdcOffset(0L)
  override def latestOffset(): Offset = {
    available = if (availableNow) maxSeq else math.min(available + rowsPerBatch, maxSeq)
    CdcOffset(available)
  }
  // admission-control form (SupportsTriggerAvailableNow extends it): the
  // start offset comes from the checkpoint, so resumed queries advance
  // from the durable position rather than this instance's counter. The
  // rowsPerBatch rate limit holds under AvailableNow too — the wrapper
  // keeps triggering micro-batches until the prepared end, so a drain is
  // N bounded batches, never one unbounded catch-up batch
  override def latestOffset(start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset = {
    val s = start.asInstanceOf[CdcOffset].seq
    available = math.min(s + rowsPerBatch, maxSeq)
    CdcOffset(available)
  }
  override def getDefaultReadLimit: org.apache.spark.sql.connector.read.streaming.ReadLimit =
    org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()
  override def deserializeOffset(json: String): Offset = {
    // a CDC source must fail LOUDLY on an unreadable position — silently
    // restarting from 0 would replay the entire stream as duplicates
    val m = """"seq"\s*:\s*(\d+)""".r.findFirstMatchIn(json)
    CdcOffset(m.map(_.group(1).toLong).getOrElse(
      throw new IllegalArgumentException(s"unreadable CDC offset: '$json'")))
  }
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val (s, e) = (start.asInstanceOf[CdcOffset].seq, end.asInstanceOf[CdcOffset].seq)
    val span = e - s
    if (span <= 0) return Array.empty
    val per = math.max(1L, (span + numPartitions - 1) / numPartitions)
    (0 until numPartitions).flatMap { i =>
      val lo = s + i * per
      val hi = math.min(e, lo + per)
      if (lo >= e) None else Some(CdcRange(lo, hi, numKeys): InputPartition)
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
        val r = p.asInstanceOf[CdcRange]
        new PartitionReader[InternalRow] {
          private var cur = r.from - 1
          override def next(): Boolean = { cur += 1; cur < r.until }
          override def get(): InternalRow = CdcRateSource.rowFor(cur, r.numKeys)
          override def close(): Unit = ()
        }
      }
    }
}

final case class CdcRange(from: Long, until: Long, numKeys: Long) extends InputPartition
