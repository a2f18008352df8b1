package graft.sinks

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** Minimal Elasticsearch REST transport executing the payloads `EsBulk`
  * renders — the missing half of the ES seat, HTTP all the way, proven
  * against a stub cluster (JDK HttpServer) in `EsRestSinkSpec`.
  *
  * Mirrors what the reference drives through the olivere/elastic client
  * (/root/reference pkg/outputs/elasticsearch/elasticsearch.go:116-199,
  * pkg/outputs/esmodel/esmodel.go:542-673):
  *   - HEAD index / GET _mapping / PUT index / PUT _mapping — the
  *     checkAndSetIndex decision executed over the wire;
  *   - PUT _scripts/<name> for the three stored child-array scripts;
  *   - POST _bulk with x-ndjson, per-item status parsing, failed-item
  *     surfacing, and bounded retry on 429/5xx/IO errors.
  *
  * Response handling deliberately stays at the status/shape level (a
  * production deployment would swap in the official client for full
  * response typing) — but the REQUEST side is byte-exact: the NDJSON
  * bodies are EsBulk's rendered lines with the trailing newline _bulk
  * requires.
  */
class EsRestSink(baseUrl: String, retries: Int = 3, retrySleepMs: Long = 50,
    /** security credentials — ES 8 defaults to auth ON. basicAuth =
      * (user, password) renders an RFC 7617 Basic header; apiKey is the
      * base64 id:key form ("ApiKey …"). At most one may be set. */
    basicAuth: Option[(String, String)] = None,
    apiKey: Option[String] = None,
    /** TLS context for an https base URL (ES 8 serves HTTPS by
      * default, self-signed out of the box — the context must trust
      * the cluster's certificate; hostname verification stays ON) */
    sslContext: Option[javax.net.ssl.SSLContext] = None,
    /** per-request timeout: a stalled cluster surfaces as a (retried,
      * then thrown) HttpTimeoutException instead of hanging a sink
      * worker indefinitely */
    requestTimeoutSeconds: Long = 30) {

  require(basicAuth.isEmpty || apiKey.isEmpty,
    "es: set basicAuth or apiKey, not both")

  private val client = {
    val b = HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(5))
    sslContext.foreach(b.sslContext)
    b.build()
  }

  private val authHeader: Option[String] =
    basicAuth.map { case (u, p) =>
      "Basic " + java.util.Base64.getEncoder.encodeToString(
        s"$u:$p".getBytes("UTF-8"))
    }.orElse(apiKey.map("ApiKey " + _))

  private def req(path: String) = {
    val b = HttpRequest.newBuilder(URI.create(baseUrl + path))
      .timeout(Duration.ofSeconds(requestTimeoutSeconds))
    authHeader.foreach(b.header("Authorization", _))
    b
  }

  private def send(r: HttpRequest): HttpResponse[String] =
    client.send(r, HttpResponse.BodyHandlers.ofString())

  /** Retry IO errors and 429/5xx with bounded attempts (the reference's
    * nr-retries × retry-sleep loop).
    */
  private def withRetry[T](op: () => HttpResponse[String]): HttpResponse[String] = {
    var attempt = 0
    var last: Either[Throwable, HttpResponse[String]] = null
    while (attempt <= retries) {
      last =
        try {
          val r = op()
          if (r.statusCode() == 429 || r.statusCode() >= 500) Right(r)
          else return r
        } catch { case e: java.io.IOException => Left(e) }
      attempt += 1
      if (attempt <= retries) Thread.sleep(retrySleepMs)
    }
    last match {
      case Right(r) => r
      case Left(e) => throw new java.io.IOException(
        s"ES request failed after ${retries + 1} attempts", e)
    }
  }

  def indexExists(index: String): Boolean =
    withRetry(() => send(req(s"/$index").method("HEAD",
      HttpRequest.BodyPublishers.noBody()).build())).statusCode() == 200

  /** Top-level property names of an existing index's mapping (enough for
    * EsBulk.planIndexSetup's missing-property delta).
    */
  def mappingProps(index: String): Option[Set[String]] = {
    val r = withRetry(() => send(req(s"/$index/_mapping").GET().build()))
    if (r.statusCode() != 200) None
    else {
      val m = "\"properties\"\\s*:\\s*\\{".r.findFirstMatchIn(r.body())
      m.map { hit =>
        // scan the first properties object one level deep
        val s = r.body().substring(hit.end)
        var depth = 0; var i = 0; val names = Seq.newBuilder[String]
        val name = new StringBuilder; var inStr = false; var strIsName = false
        while (i < s.length && depth >= 0) {
          val c = s.charAt(i)
          if (inStr) {
            if (c == '"') { inStr = false; if (strIsName && depth == 0) names += name.toString }
            else name.append(c)
          } else c match {
            case '"' => inStr = true; name.clear()
              strIsName = s.drop(i + 1).dropWhile(_ != '"').drop(1).dropWhile(_.isWhitespace).startsWith(":")
            case '{' => depth += 1
            case '}' => depth -= 1
            case _ =>
          }
          i += 1
        }
        names.result().toSet
      }
    }
  }

  private def put(path: String, json: String): Int =
    withRetry(() => send(req(path)
      .header("Content-Type", "application/json")
      .PUT(HttpRequest.BodyPublishers.ofString(json)).build())).statusCode()

  def createIndex(index: String, body: String): Unit =
    require(put(s"/$index", body) / 100 == 2, s"create index $index failed")

  def putMapping(index: String, body: String): Unit =
    require(put(s"/$index/_mapping", body) / 100 == 2, s"put mapping $index failed")

  def putScript(name: String, body: String): Unit =
    require(put(s"/_scripts/$name", body) / 100 == 2, s"put script $name failed")

  /** The checkAndSetIndex decision (EsBulk.planIndexSetup) executed over
    * the wire: create when absent, mapping delta when properties are
    * missing, no-op otherwise. Returns the action taken.
    */
  def checkAndSetIndex(index: String, objectProps: Seq[String],
      nestedProps: Seq[String], shards: Int, replicas: Int): String = {
    val existing = if (indexExists(index)) mappingProps(index) else None
    EsBulk.planIndexSetup(existing, objectProps, nestedProps, shards, replicas) match {
      case EsBulk.CreateIndex(body) => createIndex(index, body); "created"
      case EsBulk.UpdateMapping(body) => putMapping(index, body); "mapping-updated"
      case EsBulk.NoChange => "noop"
    }
  }

  /** POST the rendered action lines as one _bulk body (x-ndjson, trailing
    * newline). Returns (itemCount, indices of failed items) parsed from
    * the per-item statuses.
    */
  def bulk(lines: Seq[String]): (Int, Seq[Int]) = {
    if (lines.isEmpty) return (0, Nil)
    val body = lines.mkString("\n") + "\n"
    val r = withRetry(() => send(req("/_bulk")
      .header("Content-Type", "application/x-ndjson")
      .POST(HttpRequest.BodyPublishers.ofString(body)).build()))
    require(r.statusCode() / 100 == 2, s"_bulk HTTP ${r.statusCode()}")
    val statuses = "\"status\"\\s*:\\s*(\\d+)".r
      .findAllMatchIn(r.body()).map(_.group(1).toInt).toSeq
    (statuses.size, statuses.zipWithIndex.collect { case (s, i) if s >= 300 => i })
  }
}
