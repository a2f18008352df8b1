package graft.tools

import graft.operators.GrpcWire

/** The reference's Prometheus service-discovery sidecar
  * (cmd/prometheus_etcd_sd/main.go): read every key under an etcd prefix
  * (`/services/<job>/<instance>` → scrape url), keep a services map live
  * via an etcd WATCH, and persist Prometheus file_sd target groups
  * atomically on every change.
  *
  * etcd v3's client protocol IS gRPC (clientv3 dials
  * /etcdserverpb.KV/Range and /etcdserverpb.Watch/Watch), so this rides
  * the hand-rolled [[GrpcWire]] transport — Range as a unary call, Watch
  * as a server-streaming call on a dedicated connection. The protobuf
  * schema subset below is from etcd's public rpc.proto / kv.proto.
  */
object EtcdPb {

  // ------------------------------------------------- wire primitives

  final class W {
    private val out = new java.io.ByteArrayOutputStream(64)
    def result(): Array[Byte] = out.toByteArray
    private def varint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt)
    }
    def vint(field: Int, v: Long): Unit =
      if (v != 0) { varint((field.toLong << 3) | 0); varint(v) }
    def bytes(field: Int, b: Array[Byte]): Unit =
      if (b.nonEmpty) { varint((field.toLong << 3) | 2); varint(b.length.toLong); out.write(b, 0, b.length) }
    def embedded(field: Int, b: Array[Byte]): Unit = {
      varint((field.toLong << 3) | 2); varint(b.length.toLong); out.write(b, 0, b.length)
    }
  }

  final class R(buf: Array[Byte], start: Int, end: Int) {
    def this(buf: Array[Byte]) = this(buf, 0, buf.length)
    private var pos = start
    def hasNext: Boolean = pos < end
    def readVarint(): Long = {
      var shift = 0; var res = 0L
      var b = buf(pos) & 0xff; pos += 1
      while ((b & 0x80) != 0) {
        res |= (b & 0x7fL) << shift; shift += 7
        b = buf(pos) & 0xff; pos += 1
      }
      res | ((b & 0x7fL) << shift)
    }
    def readTag(): (Int, Int) = { val v = readVarint(); ((v >>> 3).toInt, (v & 7).toInt) }
    def readSpan(): (Int, Int) = {
      val len = readVarint().toInt; val s = pos; pos += len; (s, s + len)
    }
    def readBytes(): Array[Byte] = {
      val (s, e) = readSpan(); java.util.Arrays.copyOfRange(buf, s, e)
    }
    def sub(): R = { val (s, e) = readSpan(); new R(buf, s, e) }
    def skip(wire: Int): Unit = wire match {
      case 0 => readVarint()
      case 1 => pos += 8
      case 2 => val len = readVarint().toInt; pos += len
      case 5 => pos += 4
      case w => throw new IllegalArgumentException(s"etcdpb: wire type $w")
    }
  }

  // ---------------------------------------------------------- schema

  final case class KeyValue(key: String, value: String, modRevision: Long = 0L)
  final case class Event(isDelete: Boolean, kv: KeyValue)

  /** etcd's WithPrefix range end: the prefix with its last byte + 1. */
  def prefixEnd(prefix: String): Array[Byte] = {
    val b = prefix.getBytes("UTF-8").clone()
    var i = b.length - 1
    while (i >= 0) {
      if ((b(i) & 0xff) < 0xff) { b(i) = (b(i) + 1).toByte; return b.take(i + 1) }
      i -= 1
    }
    Array(0) // whole keyspace ("\0") — all keys >= prefix of 0xff bytes
  }

  /** RangeRequest{ key=1, range_end=2 }. */
  def encodeRangeRequest(prefix: String): Array[Byte] = {
    val w = new W
    w.bytes(1, prefix.getBytes("UTF-8"))
    w.bytes(2, prefixEnd(prefix))
    w.result()
  }

  def decodeRangeRequest(b: Array[Byte]): (String, Array[Byte]) = {
    val r = new R(b)
    var key = ""; var end = Array.emptyByteArray
    while (r.hasNext) r.readTag() match {
      case (1, 2) => key = new String(r.readBytes(), "UTF-8")
      case (2, 2) => end = r.readBytes()
      case (_, w) => r.skip(w)
    }
    (key, end)
  }

  private def decodeKeyValue(r: R): KeyValue = {
    var key = ""; var value = ""; var mod = 0L
    while (r.hasNext) r.readTag() match {
      case (1, 2) => key = new String(r.readBytes(), "UTF-8")
      case (3, 0) => mod = r.readVarint()
      case (5, 2) => value = new String(r.readBytes(), "UTF-8")
      case (_, w) => r.skip(w)
    }
    KeyValue(key, value, mod)
  }

  private def encodeKeyValue(kv: KeyValue): Array[Byte] = {
    val w = new W
    w.bytes(1, kv.key.getBytes("UTF-8"))
    w.vint(3, kv.modRevision)
    w.bytes(5, kv.value.getBytes("UTF-8"))
    w.result()
  }

  /** RangeResponse{ header=1, kvs=2 repeated, more=3, count=4 }. */
  def encodeRangeResponse(kvs: Seq[KeyValue]): Array[Byte] = {
    val w = new W
    w.embedded(1, Array.emptyByteArray) // ResponseHeader{} — present, empty
    kvs.foreach(kv => w.embedded(2, encodeKeyValue(kv)))
    w.vint(4, kvs.size.toLong)
    w.result()
  }

  def decodeRangeResponse(b: Array[Byte]): Seq[KeyValue] = {
    val r = new R(b)
    val kvs = Seq.newBuilder[KeyValue]
    while (r.hasNext) r.readTag() match {
      case (2, 2) => kvs += decodeKeyValue(r.sub())
      case (_, w) => r.skip(w)
    }
    kvs.result()
  }

  /** WatchRequest{ create_request=1 WatchCreateRequest{ key=1,
    * range_end=2 } }.
    */
  def encodeWatchCreate(prefix: String): Array[Byte] = {
    val c = new W
    c.bytes(1, prefix.getBytes("UTF-8"))
    c.bytes(2, prefixEnd(prefix))
    val w = new W
    w.embedded(1, c.result())
    w.result()
  }

  def decodeWatchCreatePrefix(b: Array[Byte]): Option[String] = {
    val r = new R(b)
    var prefix: Option[String] = None
    while (r.hasNext) r.readTag() match {
      case (1, 2) =>
        val cr = r.sub()
        while (cr.hasNext) cr.readTag() match {
          case (1, 2) => prefix = Some(new String(cr.readBytes(), "UTF-8"))
          case (_, w) => cr.skip(w)
        }
      case (_, w) => r.skip(w)
    }
    prefix
  }

  /** WatchResponse{ header=1, watch_id=2, created=3, events=11 repeated
    * mvccpb.Event{ type=1 (PUT=0/DELETE=1), kv=2 } }.
    */
  def encodeWatchResponse(created: Boolean, events: Seq[Event]): Array[Byte] = {
    val w = new W
    w.embedded(1, Array.emptyByteArray)
    if (created) w.vint(3, 1L)
    events.foreach { ev =>
      val e = new W
      if (ev.isDelete) e.vint(1, 1L)
      e.embedded(2, encodeKeyValue(ev.kv))
      w.embedded(11, e.result())
    }
    w.result()
  }

  def decodeWatchResponse(b: Array[Byte]): (Boolean, Seq[Event]) = {
    val r = new R(b)
    var created = false
    val events = Seq.newBuilder[Event]
    while (r.hasNext) r.readTag() match {
      case (3, 0) => created = r.readVarint() != 0
      case (11, 2) =>
        val er = r.sub()
        var del = false; var kv = KeyValue("", "")
        while (er.hasNext) er.readTag() match {
          case (1, 0) => del = er.readVarint() == 1L
          case (2, 2) => kv = decodeKeyValue(er.sub())
          case (_, w) => er.skip(w)
        }
        events += Event(del, kv)
      case (_, w) => r.skip(w)
    }
    (created, events.result())
  }

  val RangePath = "/etcdserverpb.KV/Range"
  val WatchPath = "/etcdserverpb.Watch/Watch"
}

/** The SD sidecar itself. `run` is the testable core: initial Range,
  * then consume the Watch stream until the server closes it, persisting
  * the target-group file atomically (write temp + rename, the
  * reference's renameFile) after the initial read and after every watch
  * batch. Key layout and output shape match the reference exactly:
  * `/services/<job>/<instance>` → url, file content
  * `[{"targets":[...],"labels":{"job":"<job>"}}]`.
  */
object PrometheusEtcdSd {

  def main(args: Array[String]): Unit = {
    def flag(name: String, default: String): String =
      args.collectFirst { case a if a.startsWith(s"--$name=") =>
        a.substring(name.length + 3) }.getOrElse(default)
    val server = flag("server", "127.0.0.1:2379")
    val colon = server.lastIndexOf(':')
    run(server.substring(0, colon), server.substring(colon + 1).toInt,
      flag("prefix", "/services"), flag("target-file", "tgroups.json"))
  }

  def run(host: String, port: Int, prefix: String, targetFile: String): Unit = {
    val srvs = scala.collection.mutable.Map
      .empty[String, scala.collection.mutable.Map[String, String]]

    def convert(key: String): (String, String) = {
      val sp = key.split('/')
      (sp(2), sp(3))
    }
    def update(kv: EtcdPb.KeyValue): Unit = {
      val (service, instance) = convert(kv.key)
      srvs.getOrElseUpdate(service,
        scala.collection.mutable.Map.empty)(instance) = kv.value
    }
    def delete(kv: EtcdPb.KeyValue): Unit = {
      val (service, instance) = convert(kv.key)
      srvs.get(service).foreach { insts =>
        insts.remove(instance)
        if (insts.isEmpty) srvs.remove(service)
      }
    }
    def persist(): Unit = {
      import graft.core.JsonText.{str => q}
      val groups = srvs.toSeq.sortBy(_._1).map { case (job, insts) =>
        val targets = insts.values.toSeq.sorted.map(q).mkString("[", ",", "]")
        s"""{"targets":$targets,"labels":{"job":${q(job)}}}"""
      }.mkString("[", ",", "]")
      val tmp = java.nio.file.Paths.get(targetFile + ".tmp")
      java.nio.file.Files.writeString(tmp, groups)
      java.nio.file.Files.move(tmp, java.nio.file.Paths.get(targetFile),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }

    // initial read (main.go:47-53)
    val kvClient = new GrpcWire.GrpcWireClient(host, port).connect()
    try {
      EtcdPb.decodeRangeResponse(
        kvClient.call(EtcdPb.RangePath, EtcdPb.encodeRangeRequest(prefix)))
        .foreach(update)
    } finally kvClient.close()
    persist()

    // watch loop (main.go:55-70) — a dedicated connection; ends when the
    // server closes the stream (clientv3's channel-close semantics)
    val watchClient = new GrpcWire.GrpcWireClient(host, port,
      readTimeoutMs = 24 * 3600 * 1000).connect()
    try {
      val stream = watchClient.serverStream(
        EtcdPb.WatchPath, EtcdPb.encodeWatchCreate(prefix))
      var msg = stream.next()
      while (msg.isDefined) {
        val (_, events) = EtcdPb.decodeWatchResponse(msg.get)
        if (events.nonEmpty) {
          events.foreach(ev => if (ev.isDelete) delete(ev.kv) else update(ev.kv))
          persist()
        }
        msg = stream.next()
      }
    } finally watchClient.close()
  }
}
