package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

class HealthSpec extends SparkSpec {
  import spark.implicits._

  test("health listener observes batch progress and reports status") {
    val listener = new HealthListener()
    spark.streams.addListener(listener)
    try {
      implicit val sc = spark.sqlContext
      val mem = MemoryStream[Long]
      mem.addData(1L to 100L: _*)
      val q = mem.toDF.toDF("v").groupBy().count()
        .writeStream.outputMode(OutputMode.Complete())
        .format("memory").queryName("health_probe")
        .trigger(Trigger.AvailableNow()).start()
      withStream(q)(q.awaitTermination())
      // listener events are delivered asynchronously
      val deadline = System.currentTimeMillis() + 10000
      while (listener.batches.isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(100)

      assert(listener.batches.nonEmpty)
      assert(listener.batches.map(_.numInputRows).sum == 100)
      assert(listener.healthy)
      val st = listener.statusReport
      assert(st("healthy") == true && st("total_rows") == 100L)
    } finally spark.streams.removeListener(listener)
  }

  test("http admin surface: /healthz, /status json, /reset callback") {
    def get(port: Int, path: String): (Int, String) = {
      val conn = new java.net.URL(s"http://127.0.0.1:$port$path")
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      val code = conn.getResponseCode
      val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
      val body = Option(is).map(s =>
        scala.io.Source.fromInputStream(s, "UTF-8").mkString).getOrElse("")
      conn.disconnect()
      (code, body)
    }

    val listener = new HealthListener()
    var resets = 0
    val canary = new CanaryTracker
    val srv = new HealthServer(listener, Some(canary),
      resetPositions = () => { resets += 1; true }).start()
    try {
      val port = srv.boundPort
      // no probe seen yet -> canary not alive -> unhealthy
      assert(get(port, "/healthz")._1 == 500)
      canary.record(System.currentTimeMillis() - 50)
      assert(get(port, "/healthz")._1 == 200)

      val (sc, body) = get(port, "/status")
      assert(sc == 200)
      assert(body.contains("\"healthy\":true") && body.contains("\"canary_lag_ms\":"))

      assert(get(port, "/reset") == (200, "position cleared"))
      assert(resets == 1)
    } finally srv.stop()
  }

  test("/metrics serves gravity-named prometheus text; counters monotonic across batches") {
    def scrape(port: Int): String = {
      val conn = new java.net.URL(s"http://127.0.0.1:$port/metrics")
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      assert(conn.getResponseCode == 200)
      assert(conn.getContentType.startsWith("text/plain"))
      val body = scala.io.Source.fromInputStream(conn.getInputStream, "UTF-8").mkString
      conn.disconnect()
      body
    }
    def counterOf(body: String, name: String): Long = {
      val re = (java.util.regex.Pattern.quote(name) + """\{[^}]*\} (\d+)""").r
      re.findAllMatchIn(body).map(_.group(1).toLong).sum
    }
    val listener = new HealthListener()
    spark.streams.addListener(listener)
    val srv = new HealthServer(listener).start()
    try {
      implicit val sc = spark.sqlContext
      val mem = MemoryStream[Long]
      val q = mem.toDF.toDF("v").writeStream.outputMode(OutputMode.Append())
        .format("noop").queryName("metrics_probe").start()
      withStream(q) {
      def drainTo(expect: Long): String = {
        q.processAllAvailable()
        val deadline = System.currentTimeMillis() + 10000
        var body = scrape(srv.boundPort)
        while (counterOf(body, "gravity_input_counter") < expect &&
            System.currentTimeMillis() < deadline) {
          Thread.sleep(100); body = scrape(srv.boundPort)
        }
        body
      }
      mem.addData(1L to 60L: _*)
      val s1 = scrape(srv.boundPort) // may be pre-batch; just well-formed
      assert(!s1.contains("NaN"))
      val b1 = drainTo(60)
      assert(counterOf(b1, "gravity_input_counter") == 60)
      // every stage handoff counted the same rows (gravity's conveyor)
      assert(counterOf(b1, "gravity_scheduler_output_counter") == 60)
      // histogram exposition well-formed: +Inf bucket equals _count
      val inf = """gravity_process_time_latency_bucket\{[^}]*le="\+Inf"\} (\d+)""".r
        .findFirstMatchIn(b1).map(_.group(1).toLong)
      val cnt = """gravity_process_time_latency_count\{[^}]*\} (\d+)""".r
        .findFirstMatchIn(b1).map(_.group(1).toLong)
      assert(inf.nonEmpty && inf == cnt)
      assert(b1.contains("# TYPE gravity_input_counter counter"))
      assert(b1.contains("# TYPE gravity_process_time_latency histogram"))
      mem.addData(1L to 40L: _*)
      val b2 = drainTo(100)
      assert(counterOf(b2, "gravity_input_counter") == 100,
        "counters must be monotonic across batches")
      }
    } finally { srv.stop(); spark.streams.removeListener(listener) }
  }
}
