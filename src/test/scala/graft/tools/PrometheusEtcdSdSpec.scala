package graft.tools

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.GrpcWire

/** The SD sidecar against a stub etcd v3 speaking the server side of the
  * real protocol: unary Range, server-streaming Watch over one h2c
  * stream — the first streaming rpc the GrpcWire transport serves.
  */
class PrometheusEtcdSdSpec extends AnyFunSuite {

  test("etcd pb codecs round-trip; prefixEnd increments the last byte") {
    assert(EtcdPb.prefixEnd("/services").sameElements("/servicet".getBytes("UTF-8")))
    assert(EtcdPb.prefixEnd("a").sameElements(Array('b'.toByte)))
    val (k, e) = EtcdPb.decodeRangeRequest(EtcdPb.encodeRangeRequest("/services"))
    assert(k == "/services" && new String(e, "UTF-8") == "/servicet")
    val kvs = Seq(EtcdPb.KeyValue("/services/g/i1", "http://h:8080", 7L),
      EtcdPb.KeyValue("/services/g/i2", "http://h:8081", 9L))
    assert(EtcdPb.decodeRangeResponse(EtcdPb.encodeRangeResponse(kvs)) == kvs)
    assert(EtcdPb.decodeWatchCreatePrefix(
      EtcdPb.encodeWatchCreate("/services")).contains("/services"))
    val evs = Seq(EtcdPb.Event(false, kvs.head), EtcdPb.Event(true, kvs(1)))
    val (created, got) = EtcdPb.decodeWatchResponse(
      EtcdPb.encodeWatchResponse(created = true, evs))
    assert(created && got == evs)
  }

  test("SD sidecar: initial Range, watch PUT/DELETE batches, atomic file_sd output") {
    val dir = java.nio.file.Files.createTempDirectory("etcd-sd").toString
    val target = s"$dir/tgroups.json"
    // the stub emits: create-confirmation, then a PUT batch (new job),
    // then a DELETE batch removing one gravity instance, then closes
    val watchServed = new java.util.concurrent.CountDownLatch(1)
    val server = new GrpcWire.GrpcWireServer(
      handlers = Map(
        EtcdPb.RangePath -> { req =>
          val (key, _) = EtcdPb.decodeRangeRequest(req)
          require(key == "/services", s"stub etcd: unexpected prefix $key")
          EtcdPb.encodeRangeResponse(Seq(
            EtcdPb.KeyValue("/services/gravity/inst1", "10.0.0.1:8080", 1L),
            EtcdPb.KeyValue("/services/gravity/inst2", "10.0.0.2:8080", 2L)))
        }),
      streamHandlers = Map(
        EtcdPb.WatchPath -> { (req, emit) =>
          assert(EtcdPb.decodeWatchCreatePrefix(req).contains("/services"))
          emit(EtcdPb.encodeWatchResponse(created = true, Nil))
          emit(EtcdPb.encodeWatchResponse(created = false, Seq(
            EtcdPb.Event(false, EtcdPb.KeyValue("/services/dcp/inst1", "10.0.1.1:9090", 3L)))))
          emit(EtcdPb.encodeWatchResponse(created = false, Seq(
            EtcdPb.Event(true, EtcdPb.KeyValue("/services/gravity/inst2", "", 4L)))))
          watchServed.countDown()
        }))
    try {
      PrometheusEtcdSd.run("127.0.0.1", server.port, "/services", target)
      assert(watchServed.await(5, java.util.concurrent.TimeUnit.SECONDS))
      val json = java.nio.file.Files.readString(java.nio.file.Paths.get(target))
      // final state: gravity lost inst2, dcp gained inst1
      assert(json ==
        """[{"targets":["10.0.1.1:9090"],"labels":{"job":"dcp"}},""" +
        """{"targets":["10.0.0.1:8080"],"labels":{"job":"gravity"}}]""")
      // no temp residue — the rename is atomic
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(target + ".tmp")))
      import scala.jdk.CollectionConverters._
      assert(server.calls.asScala.toSeq ==
        Seq(EtcdPb.RangePath, EtcdPb.WatchPath))
    } finally server.close()
  }

  test("a watch stream closed with an error status surfaces, not hangs") {
    val server = new GrpcWire.GrpcWireServer(
      handlers = Map.empty,
      streamHandlers = Map(
        EtcdPb.WatchPath -> { (_, emit) =>
          emit(EtcdPb.encodeWatchResponse(created = true, Nil))
          sys.error("compaction boundary")
        }))
    try {
      val c = new GrpcWire.GrpcWireClient("127.0.0.1", server.port).connect()
      try {
        val stream = c.serverStream(EtcdPb.WatchPath, EtcdPb.encodeWatchCreate("/x"))
        assert(stream.next().isDefined) // the created confirmation
        val e = intercept[GrpcWire.GrpcStatusException] { stream.next() }
        assert(e.status == 2 && e.getMessage.contains("compaction"))
      } finally c.close()
    } finally server.close()
  }
}
