package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** TiDB slave-binlog protobuf decode — the reference's tidbkafka input
  * consumes this format from Kafka (/root/reference
  * pkg/inputs/tidb_kafka/binlog_tailer.go:125-232; wire spec
  * protocol/tidb/tidb.proto). The proto shape (field numbers, value
  * encodings) is the public TiDB drainer `slave.binlog` protocol; the
  * decoder below reads the protobuf wire format directly — varints and
  * length-delimited fields, unknown fields skipped — so no protobuf
  * runtime is needed.
  *
  * Value mapping follows tidb.proto's own comments: ints via
  * int64/uint64_value, floats via double_value, decimals/date/time/char
  * via string_value, blob/json via bytes_value (hex-encoded here), NULL
  * via is_null.
  */
object TidbProto {

  // ---- minimal protobuf wire reader ---------------------------------------

  final class Reader(buf: Array[Byte], start: Int, end: Int) {
    var pos: Int = start
    def hasNext: Boolean = pos < end

    def readVarint(): Long = {
      var shift = 0
      var result = 0L
      while (true) {
        val b = buf(pos); pos += 1
        result |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return result
        shift += 7
      }
      result
    }

    /** (fieldNumber, wireType) */
    def readTag(): (Int, Int) = {
      val v = readVarint()
      ((v >>> 3).toInt, (v & 7).toInt)
    }

    def readFixed64(): Long = {
      var v = 0L
      var i = 0
      while (i < 8) { v |= (buf(pos + i) & 0xffL) << (8 * i); i += 1 }
      pos += 8
      v
    }

    def readLengthDelimited(): (Int, Int) = {
      val len = readVarint().toInt
      val s = pos
      pos += len
      (s, s + len)
    }

    def readString(): String = {
      val (s, e) = readLengthDelimited()
      new String(buf, s, e - s, "UTF-8")
    }

    def readBytes(): Array[Byte] = {
      val (s, e) = readLengthDelimited()
      java.util.Arrays.copyOfRange(buf, s, e)
    }

    def skip(wireType: Int): Unit = wireType match {
      case 0 => readVarint()
      case 1 => pos += 8
      case 2 => val len = readVarint().toInt; pos += len
      case 5 => pos += 4
      case w => throw new IllegalArgumentException(s"unsupported wire type $w")
    }
  }

  // ---- message model (tidb.proto) -----------------------------------------

  final case class Col(isNull: Boolean, int64: Option[Long], uint64: Option[Long],
      double: Option[Double], bytes: Option[Array[Byte]], string: Option[String]) {
    /** Human-readable value per the proto's own encoding notes. */
    def valueString: Option[String] =
      if (isNull) None
      else string.orElse(int64.map(_.toString)).orElse(uint64.map(java.lang.Long.toUnsignedString))
        .orElse(double.map(_.toString))
        .orElse(bytes.map(_.map("%02x".format(_)).mkString))
  }
  final case class ColInfo(name: String, mysqlType: String, isPk: Boolean)
  final case class Mutation(tp: Int, row: Seq[Col], changeRow: Seq[Col])
  final case class TableChange(schema: String, table: String,
      colInfo: Seq[ColInfo], mutations: Seq[Mutation])
  final case class Binlog(tp: Int, commitTs: Long, tables: Seq[TableChange],
      ddlSchema: String, ddlTable: String, ddlQuery: String)

  private def decodeColumn(buf: Array[Byte], s: Int, e: Int): Col = {
    val r = new Reader(buf, s, e)
    var isNull = false
    var i64: Option[Long] = None
    var u64: Option[Long] = None
    var dbl: Option[Double] = None
    var bts: Option[Array[Byte]] = None
    var str: Option[String] = None
    while (r.hasNext) r.readTag() match {
      case (1, _) => isNull = r.readVarint() != 0
      case (2, _) => i64 = Some(r.readVarint())
      case (3, _) => u64 = Some(r.readVarint())
      case (4, _) => dbl = Some(java.lang.Double.longBitsToDouble(r.readFixed64()))
      case (5, _) => bts = Some(r.readBytes())
      case (6, _) => str = Some(r.readString())
      case (_, w) => r.skip(w)
    }
    Col(isNull, i64, u64, dbl, bts, str)
  }

  private def decodeRow(buf: Array[Byte], s: Int, e: Int): Seq[Col] = {
    val r = new Reader(buf, s, e)
    val out = scala.collection.mutable.ArrayBuffer.empty[Col]
    while (r.hasNext) r.readTag() match {
      case (1, 2) => val (cs, ce) = r.readLengthDelimited(); out += decodeColumn(buf, cs, ce)
      case (_, w) => r.skip(w)
    }
    out.toSeq
  }

  private def decodeColInfo(buf: Array[Byte], s: Int, e: Int): ColInfo = {
    val r = new Reader(buf, s, e)
    var name = ""
    var tpe = ""
    var pk = false
    while (r.hasNext) r.readTag() match {
      case (1, _) => name = r.readString()
      case (2, _) => tpe = r.readString()
      case (3, _) => pk = r.readVarint() != 0
      case (_, w) => r.skip(w)
    }
    ColInfo(name, tpe, pk)
  }

  private def decodeMutation(buf: Array[Byte], s: Int, e: Int): Mutation = {
    val r = new Reader(buf, s, e)
    var tp = 0
    var row: Seq[Col] = Nil
    var change: Seq[Col] = Nil
    while (r.hasNext) r.readTag() match {
      case (1, _) => tp = r.readVarint().toInt
      case (2, 2) => val (rs, re) = r.readLengthDelimited(); row = decodeRow(buf, rs, re)
      case (3, 2) => val (rs, re) = r.readLengthDelimited(); change = decodeRow(buf, rs, re)
      case (_, w) => r.skip(w)
    }
    Mutation(tp, row, change)
  }

  private def decodeTable(buf: Array[Byte], s: Int, e: Int): TableChange = {
    val r = new Reader(buf, s, e)
    var schema = ""
    var table = ""
    val infos = scala.collection.mutable.ArrayBuffer.empty[ColInfo]
    val muts = scala.collection.mutable.ArrayBuffer.empty[Mutation]
    while (r.hasNext) r.readTag() match {
      case (1, _) => schema = r.readString()
      case (2, _) => table = r.readString()
      case (3, 2) => val (cs, ce) = r.readLengthDelimited(); infos += decodeColInfo(buf, cs, ce)
      case (4, 2) => val (ms, me) = r.readLengthDelimited(); muts += decodeMutation(buf, ms, me)
      case (_, w) => r.skip(w)
    }
    TableChange(schema, table, infos.toSeq, muts.toSeq)
  }

  /** Decode one `slave.binlog.Binlog` message. */
  def decodeBinlog(bytes: Array[Byte]): Binlog = {
    val r = new Reader(bytes, 0, bytes.length)
    var tp = 0
    var commitTs = 0L
    val tables = scala.collection.mutable.ArrayBuffer.empty[TableChange]
    var ddlSchema = ""
    var ddlTable = ""
    var ddlQuery = ""
    while (r.hasNext) r.readTag() match {
      case (1, _) => tp = r.readVarint().toInt
      case (2, _) => commitTs = r.readVarint()
      case (3, 2) => // DMLData { repeated Table tables = 1 }
        val (ds, de) = r.readLengthDelimited()
        val dr = new Reader(bytes, ds, de)
        while (dr.hasNext) dr.readTag() match {
          case (1, 2) => val (ts, te) = dr.readLengthDelimited(); tables += decodeTable(bytes, ts, te)
          case (_, w) => dr.skip(w)
        }
      case (4, 2) => // DDLData
        val (ds, de) = r.readLengthDelimited()
        val dr = new Reader(bytes, ds, de)
        while (dr.hasNext) dr.readTag() match {
          case (1, _) => ddlSchema = dr.readString()
          case (2, _) => ddlTable = dr.readString()
          case (3, _) => ddlQuery = new String(dr.readBytes(), "UTF-8")
          case (_, w) => dr.skip(w)
        }
      case (_, w) => r.skip(w)
    }
    Binlog(tp, commitTs, tables.toSeq, ddlSchema, ddlTable, ddlQuery)
  }

  // ---- envelope assembly --------------------------------------------------

  final case class EnvelopeRow(seq: Long, op: String, database: String,
      table: String, event_ts: java.sql.Timestamp,
      data: Map[String, String], old: Map[String, String],
      pks: Map[String, String], ddl_statement: String)

  /** TiDB TSO → wall clock: the physical ms sit above 18 logical bits. */
  def tsoToMillis(commitTs: Long): Long = commitTs >> 18

  /** Flatten one binlog (a transaction) into envelope rows; `baseSeq`
    * orders rows within the message (the reference assigns sequence at the
    * emitter, pkg/emitter/emitter.go:67-78).
    */
  def toEnvelope(b: Binlog, baseSeq: Long): Seq[EnvelopeRow] = {
    val ts = new java.sql.Timestamp(tsoToMillis(b.commitTs))
    if (b.tp == 1) {
      Seq(EnvelopeRow(baseSeq, "ddl", b.ddlSchema, b.ddlTable, ts,
        Map.empty, Map.empty, Map.empty, b.ddlQuery))
    } else {
      var i = -1L
      b.tables.flatMap { t =>
        val names = t.colInfo.map(_.name)
        val pkNames = t.colInfo.filter(_.isPk).map(_.name).toSet
        def toMap(cols: Seq[Col]): Map[String, String] =
          names.zip(cols).flatMap { case (n, c) => c.valueString.map(n -> _) }.toMap
        t.mutations.map { m =>
          i += 1
          val op = m.tp match {
            case 0 => "insert"
            case 1 => "update"
            case 2 => "delete"
            case _ => "unknown"
          }
          // proto comment: for Update, `row` is the OLD image and
          // `change_row` the new one only when both present; drainer emits
          // new image in `row` with old in `change_row`
          val data = toMap(m.row)
          val old = if (m.changeRow.nonEmpty) toMap(m.changeRow) else Map.empty[String, String]
          EnvelopeRow(baseSeq + i, op, t.schema, t.table, ts,
            data, old, data.view.filterKeys(pkNames).toMap, null)
        }
      }
    }
  }

  /** Spark integration: decode a binary `value` column (one binlog per
    * Kafka record) into the envelope frame. Runs as a typed map on the
    * executors — each record decodes independently, so the stage shards
    * with the Kafka partitioning.
    */
  def envelopeFromBinary(df: DataFrame, valueCol: String = "value",
      seqCol: String = "seq"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ds: Dataset[(Long, Array[Byte])] =
      df.select(col(seqCol).cast("long"), col(valueCol)).as[(Long, Array[Byte])]
    // each message may carry many rows; give per-message seqs headroom
    ds.flatMap { case (seq, bytes) => toEnvelope(decodeBinlog(bytes), seq << 20) }
      .toDF()
  }
}
