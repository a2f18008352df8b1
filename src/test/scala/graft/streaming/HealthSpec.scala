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
      q.awaitTermination()
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
}
