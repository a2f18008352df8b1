package graft.sinks

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import scala.collection.mutable

/** EsRestSink against a stub ES cluster (JDK HttpServer): the
  * checkAndSetIndex decision over the wire (create / mapping-delta /
  * no-op), _bulk NDJSON with per-item status parsing and failed-item
  * surfacing, and bounded retry on 503.
  */
class EsRestSinkSpec extends AnyFunSuite {

  private def withStub(test: (String, StubEs) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val stub = new StubEs(server)
    server.start()
    try test(s"http://127.0.0.1:${server.getAddress.getPort}", stub)
    finally server.stop(0)
  }

  private class StubEs(server: HttpServer) {
    val indices = mutable.Map.empty[String, Set[String]] // index -> mapped props
    val requests = mutable.ArrayBuffer.empty[(String, String, String)] // method, path, body
    var bulkFailuresLeft = 0 // respond 503 to this many _bulk calls
    var failDocIds: Set[String] = Set.empty // item-level 409s
    /** security on (the ES 8 default): exact Authorization header the
      * cluster accepts; anything else is 401 before any processing */
    var requireAuth: Option[String] = None
    val authHeadersSeen = mutable.ArrayBuffer.empty[String]

    private def body(ex: HttpExchange): String =
      new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)

    private def respond(ex: HttpExchange, code: Int, payload: String): Unit = {
      val b = payload.getBytes(StandardCharsets.UTF_8)
      if (ex.getRequestMethod == "HEAD") { ex.sendResponseHeaders(code, -1) }
      else { ex.sendResponseHeaders(code, b.length); ex.getResponseBody.write(b) }
      ex.close()
    }

    server.createContext("/", (ex: HttpExchange) => {
      val path = ex.getRequestURI.getPath
      val method = ex.getRequestMethod
      val b = body(ex)
      requests += ((method, path, b))
      val auth = Option(ex.getRequestHeaders.getFirst("Authorization"))
      auth.foreach(authHeadersSeen += _)
      if (requireAuth.nonEmpty && auth != requireAuth)
        respond(ex, 401, """{"error":{"type":"security_exception"}}""")
      else (method, path) match {
        case ("POST", "/_bulk") =>
          if (bulkFailuresLeft > 0) { bulkFailuresLeft -= 1; respond(ex, 503, "{}") }
          else {
            val actions = b.split("\n").filter(l =>
              l.startsWith("{\"index\"") || l.startsWith("{\"delete\"") || l.startsWith("{\"update\""))
            val items = actions.map { l =>
              val failed = failDocIds.exists(id => l.contains("\"_id\":\"" + id + "\""))
              val st = if (failed) 409 else 200
              s"""{"index":{"status":$st}}"""
            }
            respond(ex, 200,
              s"""{"errors":${items.exists(_.contains("409"))},"items":[${items.mkString(",")}]}""")
          }
        case ("HEAD", p) =>
          respond(ex, if (indices.contains(p.stripPrefix("/"))) 200 else 404, "")
        case ("GET", p) if p.endsWith("/_mapping") =>
          val idx = p.stripPrefix("/").stripSuffix("/_mapping")
          indices.get(idx) match {
            case Some(props) =>
              val propJson = props.map(n => s""""$n":{"type":"object"}""").mkString(",")
              respond(ex, 200, s"""{"$idx":{"mappings":{"properties":{$propJson}}}}""")
            case None => respond(ex, 404, "{}")
          }
        case ("PUT", p) if p.startsWith("/_scripts/") => respond(ex, 200, """{"acknowledged":true}""")
        case ("PUT", p) if p.endsWith("/_mapping") =>
          val idx = p.stripPrefix("/").stripSuffix("/_mapping")
          val added = "\"([a-z0-9_]+)\"\\s*:\\s*\\{\"type\"".r
            .findAllMatchIn(b).map(_.group(1)).toSet -- Set("type")
          indices(idx) = indices.getOrElse(idx, Set.empty) ++ added
          respond(ex, 200, """{"acknowledged":true}""")
        case ("PUT", p) =>
          val idx = p.stripPrefix("/")
          val props = "\"([a-z0-9_]+)\"\\s*:\\s*\\{\"type\"".r
            .findAllMatchIn(b).map(_.group(1)).toSet
          indices(idx) = props
          respond(ex, 200, """{"acknowledged":true}""")
        case _ => respond(ex, 400, "{}")
      }
    })
  }

  test("checkAndSetIndex over the wire: create, then no-op, then mapping delta") {
    withStub { (url, stub) =>
      val sink = new EsRestSink(url)
      assert(sink.checkAndSetIndex("orders", Seq("o_orderkey", "o_status"), Nil, 1, 0) == "created")
      assert(stub.indices("orders") == Set("o_orderkey", "o_status"))
      assert(sink.checkAndSetIndex("orders", Seq("o_orderkey", "o_status"), Nil, 1, 0) == "noop")
      assert(sink.checkAndSetIndex("orders", Seq("o_orderkey"), Seq("children"), 1, 0)
        == "mapping-updated")
      assert(stub.indices("orders").contains("children"))
    }
  }

  test("bulk posts EsBulk's NDJSON with trailing newline and surfaces item failures") {
    withStub { (url, stub) =>
      stub.failDocIds = Set("7_2")
      val sink = new EsRestSink(url)
      val lines = Seq(
        EsBulk.indexAction("orders", "7_1", """{"k":1}"""),
        EsBulk.indexAction("orders", "7_2", """{"k":2}"""),
        EsBulk.deleteAction("orders", "7_3"))
      val (n, failed) = sink.bulk(lines)
      assert(n == 3 && failed == Seq(1))
      val (_, _, sent) = stub.requests.find(_._2 == "/_bulk").get
      assert(sent == lines.mkString("\n") + "\n")
    }
  }

  test("bulk retries 503 with bounded attempts, then succeeds") {
    withStub { (url, stub) =>
      stub.bulkFailuresLeft = 2
      val sink = new EsRestSink(url, retries = 3, retrySleepMs = 1)
      val (n, failed) = sink.bulk(Seq(EsBulk.indexAction("t", "1", "{}")))
      assert(n == 1 && failed.isEmpty)
      assert(stub.requests.count(_._2 == "/_bulk") == 3) // 2 x 503 + 1 x 200
    }
  }

  test("retries exhaust into the terminal 503") {
    withStub { (url, stub) =>
      stub.bulkFailuresLeft = 10
      val sink = new EsRestSink(url, retries = 1, retrySleepMs = 1)
      intercept[IllegalArgumentException](sink.bulk(Seq(EsBulk.indexAction("t", "1", "{}"))))
    }
  }

  test("basic auth rides every request as the RFC 7617 header; 401 without it") {
    withStub { (url, stub) =>
      // "elastic:changeme" -> the exact base64 a real cluster verifies
      stub.requireAuth = Some("Basic ZWxhc3RpYzpjaGFuZ2VtZQ==")
      val sink = new EsRestSink(url, basicAuth = Some(("elastic", "changeme")),
        retries = 0, retrySleepMs = 1)
      assert(sink.checkAndSetIndex("orders", Seq("o_orderkey"), Nil, 1, 0) == "created")
      val (n, failed) = sink.bulk(Seq(EsBulk.indexAction("orders", "1", "{}")))
      assert(n == 1 && failed.isEmpty)
      assert(stub.authHeadersSeen.nonEmpty &&
        stub.authHeadersSeen.forall(_ == "Basic ZWxhc3RpYzpjaGFuZ2VtZQ=="))
      // an unauthenticated sink is refused before any processing
      val anon = new EsRestSink(url, retries = 0, retrySleepMs = 1)
      intercept[IllegalArgumentException](
        anon.bulk(Seq(EsBulk.indexAction("orders", "2", "{}"))))
      assert(stub.indices("orders").nonEmpty, "401 must not have side effects")
    }
  }

  test("api-key auth renders the ApiKey scheme; basic+apiKey together refuse") {
    withStub { (url, stub) =>
      stub.requireAuth = Some("ApiKey aWQ6c2VjcmV0")
      val sink = new EsRestSink(url, apiKey = Some("aWQ6c2VjcmV0"),
        retries = 0, retrySleepMs = 1)
      val (n, failed) = sink.bulk(Seq(EsBulk.indexAction("t", "1", "{}")))
      assert(n == 1 && failed.isEmpty)
      intercept[IllegalArgumentException](new EsRestSink(url,
        basicAuth = Some(("a", "b")), apiKey = Some("x")))
    }
  }
}
