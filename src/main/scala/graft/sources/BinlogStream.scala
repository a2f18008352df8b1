package graft.sources

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** The WIRE-BACKED CDC streaming source: [[BinlogWire.BinlogClient]]
  * plugged into the DataSourceV2 `MicroBatchStream` seat that
  * [[CdcRateSource]] proves with a generator — together they are the
  * reference's mysql-stream input (pkg/inputs/mysqlstream/
  * binlog_tailer.go:153-577 + the position/sliding-window machinery):
  * a driver-side tailer thread drains the replication stream into a
  * bounded buffer; micro-batch offsets are binlog log positions; commit
  * prunes the buffer (the ack of the reference's sliding window).
  *
  * Resume semantics are the CDC contract: on restart the client re-dumps
  * from the CONFIGURED position and every row with logPos ≤ the
  * checkpointed offset is dropped before it enters a batch — replayed
  * history is absorbed, never duplicated (binlog positions are strictly
  * monotone within a file). Backpressure: when the buffer holds
  * `maxBuffered` rows the tailer thread blocks until a commit prunes —
  * the stream never accumulates unbounded driver state.
  *
  * Options (case-insensitive): `host`, `port`, `user`, `password`,
  * `file`, `pos`, `serverId`, `rowsPerBatch` (admission control),
  * `maxBuffered`, `partitions`, and per-table column names / pks from
  * the schema store seat: `names.<db>.<table>` = "c1,c2,…",
  * `pks.<db>.<table>` = "c1[,c2]" (binlog row events carry positional
  * values only — names live in the schema store, exactly why the
  * reference pairs its tailer with one).
  *
  * Usage: `spark.readStream.format("graft.sources.BinlogStreamSource")
  * .option("host", …).load()`.
  */
class BinlogStreamSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    BinlogStreamSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new BinlogStreamTable(new CaseInsensitiveStringMap(properties))
}

object BinlogStreamSource {
  /** The enveloped change frame — same shape as
    * [[BinlogWire.envelopeFrame]] so filters/routers/sinks consume the
    * stream and the batch form identically.
    */
  val schema: StructType = StructType(Seq(
    StructField("seq", LongType, nullable = false),
    StructField("op", StringType, nullable = false),
    StructField("database", StringType, nullable = false),
    StructField("table", StringType, nullable = false),
    StructField("data", MapType(StringType, StringType), nullable = false),
    StructField("old", MapType(StringType, StringType), nullable = false),
    StructField("pks", MapType(StringType, StringType), nullable = false)))
}

final class BinlogStreamTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = "graft-binlog-stream"
  override def schema(): StructType = BinlogStreamSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = BinlogStreamSource.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new BinlogMicroBatchStream(options)
      }
    }
}

/** One enveloped change, rendered driver-side (all-serializable). */
final case class BinlogEnvelope(seq: Long, op: String, database: String,
    table: String, data: Map[String, String], old: Map[String, String],
    pks: Map[String, String])

final case class BinlogSlice(rows: Seq[BinlogEnvelope]) extends InputPartition

final class BinlogMicroBatchStream(options: CaseInsensitiveStringMap)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  private val host = {
    val h = options.get("host")
    require(h != null && h.nonEmpty, "binlog stream: option 'host' is required")
    h
  }
  private val port = options.getInt("port", 3306)
  private val user = Option(options.get("user")).getOrElse("repl")
  private val password = Option(options.get("password")).getOrElse("")
  private val file = Option(options.get("file")).getOrElse("binlog.000001")
  private val startPos = options.getLong("pos", 4L)
  private val serverId = options.getLong("serverId", 1001L)
  private val rowsPerBatch = options.getInt("rowsPerBatch", 10000)
  private val maxBuffered = options.getInt("maxBuffered", 100000)
  private val numPartitions = options.getInt("partitions", 2)

  // schema-store seat: names.<db>.<table> / pks.<db>.<table>
  private def tableOpt(prefix: String, db: String, tbl: String): Seq[String] =
    Option(options.get(s"$prefix.$db.$tbl"))
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Nil)

  // ---- the tailer: one thread, one socket, bounded buffer -------------
  private val buffer = new java.util.ArrayDeque[BinlogEnvelope]()
  private val lock = new Object
  @volatile private var tailerDone = false
  @volatile private var tailerError: Throwable = null
  private var highWater = startPos // max logPos buffered (under lock)
  private var pruned = startPos // rows ≤ this are gone from the buffer

  private def render(v: Any): String = v match {
    case null => null
    case b: Array[Byte] => java.util.Base64.getEncoder.encodeToString(b)
    case other => other.toString
  }

  private def toEnvelope(c: BinlogWire.ChangeRow): BinlogEnvelope = {
    def toMap(vs: IndexedSeq[Any]): Map[String, String] = {
      val ns = tableOpt("names", c.database, c.table) match {
        case Nil => vs.indices.map(i => s"c$i")
        case ns => ns
      }
      ns.zip(vs.map(render)).toMap
    }
    val data = toMap(c.values)
    val old = c.before.map(toMap).getOrElse(Map.empty[String, String])
    // a PK update's identity is the OLD key (msg.go Pks semantics)
    val pkSource = if (old.nonEmpty) old else data
    val pks = tableOpt("pks", c.database, c.table)
      .flatMap(k => pkSource.get(k).map(k -> _)).toMap
    BinlogEnvelope(c.seq, c.op, c.database, c.table, data, old, pks)
  }

  private val client = new BinlogWire.BinlogClient(host, port, user, password, serverId)
  private val tailer = new Thread(() => {
    try {
      client.connect()
      val rows = BinlogWire.changeRows(client.dump(file, startPos))
      rows.foreach { c =>
        val env = toEnvelope(c)
        lock.synchronized {
          while (buffer.size >= maxBuffered && !tailerDone) lock.wait(1000)
          if (!tailerDone) {
            buffer.addLast(env)
            if (env.seq > highWater) highWater = env.seq
            lock.notifyAll()
          }
        }
      }
    } catch {
      case _: java.io.EOFException => () // server closed the dump: bounded stream
      case t: Throwable => tailerError = t
    } finally {
      lock.synchronized { tailerDone = true; lock.notifyAll() }
      try client.close() catch { case _: Exception => () }
    }
  }, "graft-binlog-tailer")
  tailer.setDaemon(true)
  tailer.start()

  private def raise(): Unit = {
    val t = tailerError
    if (t != null) throw new IllegalStateException("binlog tailer failed", t)
  }

  // ---- MicroBatchStream ----------------------------------------------
  // AvailableNow on a CDC tail = "drain what the master has": wait for a
  // bounded dump to complete (or drainWaitMs on an unbounded one), pin
  // the high-water mark, and serve batches only up to it.
  @volatile private var availableNowTarget: Long = Long.MaxValue
  override def prepareForTriggerAvailableNow(): Unit = {
    val deadline = System.currentTimeMillis() + options.getLong("drainWaitMs", 30000L)
    lock.synchronized {
      // stop waiting early if the buffer fills: the tailer is blocked on
      // backpressure and the high-water mark can't advance until batches
      // commit — pin what's buffered; a later run resumes past it
      while (!tailerDone && buffer.size < maxBuffered &&
          System.currentTimeMillis() < deadline) lock.wait(200)
      availableNowTarget = highWater
    }
  }

  override def initialOffset(): Offset = CdcOffset(startPos)

  override def reportLatestOffset(): Offset = {
    raise()
    lock.synchronized(CdcOffset(highWater))
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException("admission-control form only")

  /** Admission control: serve at most rowsPerBatch buffered rows past
    * `start`. Under AvailableNow the wrapper keeps triggering until the
    * prepared end, so a long catch-up drains as N bounded batches.
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    raise()
    val s = start.asInstanceOf[CdcOffset].seq
    lock.synchronized {
      var n = 0
      var end = s
      val it = buffer.iterator()
      while (it.hasNext && n < rowsPerBatch) {
        val e = it.next()
        if (e.seq > s && e.seq <= availableNowTarget) { n += 1; end = e.seq }
      }
      CdcOffset(math.max(end, s))
    }
  }

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def deserializeOffset(json: String): Offset = {
    // fail LOUDLY on an unreadable position — silently restarting from
    // the configured pos would replay history as duplicates
    val m = """"seq"\s*:\s*(\d+)""".r.findFirstMatchIn(json)
    CdcOffset(m.map(_.group(1).toLong).getOrElse(
      throw new IllegalArgumentException(s"unreadable binlog offset: '$json'")))
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    raise()
    val s = start.asInstanceOf[CdcOffset].seq
    val e = end.asInstanceOf[CdcOffset].seq
    if (e <= s) return Array.empty
    val slice = lock.synchronized {
      // rows in (s, e]; anything ≤ s is replayed history (resume) — absorbed
      val b = Seq.newBuilder[BinlogEnvelope]
      val it = buffer.iterator()
      while (it.hasNext) {
        val r = it.next()
        if (r.seq > s && r.seq <= e) b += r
      }
      b.result()
    }
    if (slice.isEmpty) return Array.empty
    val per = math.max(1, (slice.size + numPartitions - 1) / numPartitions)
    slice.grouped(per).map(g => BinlogSlice(g): InputPartition).toArray
  }

  /** The ack of the reference's sliding window: prune ≤ end. */
  override def commit(end: Offset): Unit = {
    val e = end.asInstanceOf[CdcOffset].seq
    lock.synchronized {
      while (!buffer.isEmpty && buffer.peekFirst().seq <= e) buffer.removeFirst()
      if (e > pruned) pruned = e
      lock.notifyAll() // unblock a backpressured tailer
    }
  }

  override def stop(): Unit = {
    lock.synchronized { tailerDone = true; lock.notifyAll() }
    try client.close() catch { case _: Exception => () }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
        val rows = p.asInstanceOf[BinlogSlice].rows
        new PartitionReader[InternalRow] {
          private var i = -1
          override def next(): Boolean = { i += 1; i < rows.size }
          override def get(): InternalRow = {
            val r = rows(i)
            InternalRow(r.seq, UTF8String.fromString(r.op),
              UTF8String.fromString(r.database), UTF8String.fromString(r.table),
              BinlogMicroBatchStream.mapData(r.data),
              BinlogMicroBatchStream.mapData(r.old),
              BinlogMicroBatchStream.mapData(r.pks))
          }
          override def close(): Unit = ()
        }
      }
    }
}

object BinlogMicroBatchStream {
  def mapData(m: Map[String, String]): MapData = {
    val entries = m.toSeq
    new ArrayBasedMapData(
      new GenericArrayData(entries.map(e => UTF8String.fromString(e._1)).toArray[Any]),
      new GenericArrayData(entries.map(e =>
        if (e._2 == null) null else UTF8String.fromString(e._2)).toArray[Any]))
  }
}
