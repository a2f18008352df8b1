package graft.streaming

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._
import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

/** Position administration: the reference's `/reset` endpoint clears the
  * pipeline position (cmd/gravity/main.go:185-238); here positions ARE the
  * streaming checkpoint, so reset = delete the checkpoint directory.
  */
object Positions {
  def reset(spark: org.apache.spark.sql.SparkSession, checkpointDir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(checkpointDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    !fs.exists(p) || fs.delete(p, true)
  }

  /** Last committed batch id from a checkpoint — the position a `/status`
    * report surfaces (binlog file/pos ≡ checkpoint commit log entries).
    */
  def lastCommittedBatch(spark: org.apache.spark.sql.SparkSession,
      checkpointDir: String): Option[Long] = {
    val p = new org.apache.hadoop.fs.Path(checkpointDir, "commits")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else fs.listStatus(p).map(_.getPath.getName)
      .filter(_.forall(_.isDigit)).map(_.toLong)
      .reduceOption(_ max _)
  }
}

/** Canary probing — the reference's binlog checker writes a probe row to
  * `_gravity.gravity_heartbeat_v2` every 3 s and measures liveness +
  * replication lag by observing the probe come back through the binlog
  * (/root/reference pkg/inputs/helper/binlog_checker/checker.go:22-34,
  * 95-160). Here a probe is an envelope row under the reserved canary
  * database; it rides the real pipeline (source → filters → batch hook)
  * and is measured-then-dropped at the sink boundary, so the lag it
  * reports covers the actual end-to-end path.
  */
object Canary {
  val Database = "_graft_canary"

  def isProbe: org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.col("database") === Database

  /** A probe row shaped like the given change-log schema: canary database,
    * emit time in `event_ts`-compatible millis carried via `seq`.
    */
  def probeRow(spark: org.apache.spark.sql.SparkSession,
      schema: org.apache.spark.sql.types.StructType,
      emittedAtMs: Long): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val base = spark.range(1)
    schema.fields.foldLeft(base.toDF()) { (d, f) =>
      val v = f.name match {
        case "database" => lit(Database)
        case "op" => lit("insert")
        case "seq" => lit(emittedAtMs) // emit time doubles as sequence
        case _ => lit(null)
      }
      d.withColumn(f.name, v.cast(f.dataType))
    }.select(schema.fieldNames.map(col): _*)
  }

  /** Write a probe into a file change-log directory (harness source). */
  def emitProbe(spark: org.apache.spark.sql.SparkSession, logDir: String,
      schema: org.apache.spark.sql.types.StructType,
      emittedAtMs: Long = System.currentTimeMillis()): Unit =
    probeRow(spark, schema, emittedAtMs)
      .coalesce(1).write.mode("append").parquet(logDir)
}

/** Driver-side canary observation: batches report their probes here; the
  * tracker answers alive/lag — checker.go's IsCaughtUp analogue.
  */
final class CanaryTracker {
  @volatile private var lastProbeEmitMs: Long = -1L
  @volatile private var lastSeenAtMs: Long = -1L

  def record(emittedAtMs: Long): Unit = {
    lastProbeEmitMs = math.max(lastProbeEmitMs, emittedAtMs)
    lastSeenAtMs = System.currentTimeMillis()
  }

  /** Replication lag of the most recent observed probe. */
  def lagMs: Option[Long] =
    if (lastProbeEmitMs < 0) None else Some(lastSeenAtMs - lastProbeEmitMs)

  /** Liveness: a probe has come through within the threshold. */
  def alive(withinMs: Long): Boolean =
    lastSeenAtMs > 0 && System.currentTimeMillis() - lastSeenAtMs <= withinMs
}

/** The reference's HTTP admin surface over the JDK's built-in server —
  * `/healthz` answers 200/500 from scheduler health, `/status` serves the
  * task report as JSON, `/reset` clears the position store
  * (/root/reference cmd/gravity/main.go:185-238). Here: health from the
  * HealthListener (+ canary liveness when wired), status from
  * `statusReport` (+ canary lag), reset = the supplied position-clear
  * callback (checkpoint delete via `Positions.reset`).
  */
final class HealthServer(listener: HealthListener,
    canary: Option[CanaryTracker] = None,
    canaryAliveWithinMs: Long = 30000,
    resetPositions: () => Boolean = () => false,
    port: Int = 0) {

  private val server = com.sun.net.httpserver.HttpServer.create(
    new java.net.InetSocketAddress("127.0.0.1", port), 0)

  /** Ephemeral-port friendly (port = 0 binds any free port). */
  def boundPort: Int = server.getAddress.getPort

  private def respond(ex: com.sun.net.httpserver.HttpExchange,
      code: Int, body: String, json: Boolean = false): Unit = {
    val bytes = body.getBytes("UTF-8")
    if (json) ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
    if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def jsonStr(s: String): String = graft.core.JsonText.str(s)

  private def statusJson: String = {
    val base = listener.statusReport ++ canary.map(c =>
      "canary_lag_ms" -> c.lagMs.getOrElse(-1L)).toMap
    base.map { case (k, v) =>
      val rendered = v match {
        case s: String => jsonStr(s)
        case b: Boolean => b.toString
        case n => n.toString
      }
      jsonStr(k) + ":" + rendered
    }.mkString("{", ",", "}")
  }

  server.createContext("/healthz", (ex: com.sun.net.httpserver.HttpExchange) => {
    val ok = listener.healthy && canary.forall(_.alive(canaryAliveWithinMs))
    respond(ex, if (ok) 200 else 500, "")
  })
  server.createContext("/status", (ex: com.sun.net.httpserver.HttpExchange) =>
    respond(ex, 200, statusJson, json = true))
  server.createContext("/metrics", (ex: com.sun.net.httpserver.HttpExchange) => {
    val body = listener.metrics.render().getBytes("UTF-8")
    ex.getResponseHeaders.set("Content-Type",
      "text/plain; version=0.0.4; charset=utf-8")
    ex.sendResponseHeaders(200, if (body.isEmpty) -1 else body.length)
    if (body.nonEmpty) ex.getResponseBody.write(body)
    ex.close()
  })
  server.createContext("/reset", (ex: com.sun.net.httpserver.HttpExchange) =>
    // the reference exits the process after clearing; here the caller's
    // callback owns the consequence (stop query + delete checkpoint)
    if (resetPositions()) respond(ex, 200, "position cleared")
    else respond(ex, 500, "reset failed"))

  def start(): HealthServer = { server.start(); this }
  def stop(): Unit = server.stop(0)
}

/** Pipeline health monitoring.
  *
  * The reference tracks per-stream watermarks + an unhealthy threshold on
  * commit lag (/root/reference pkg/schedulers/batch_table_scheduler/
  * batch_table_scheduler.go:152-174) and serves them over `/status`
  * (cmd/gravity/main.go:185-238). On Spark the same signals come from the
  * StreamingQueryListener progress events; this listener keeps a bounded
  * history and answers the healthy/lag questions.
  */
final class HealthListener(historySize: Int = 64,
    unhealthyAfterMs: Long = 30000,
    pipelineName: String = "graft") extends StreamingQueryListener {

  /** Prometheus families (gravity's names) fed from progress events;
    * served by HealthServer's /metrics.
    */
  val metrics = new MetricsRegistry(pipelineName)

  final case class BatchHealth(
      queryName: String,
      batchId: Long,
      numInputRows: Long,
      batchDurationMs: Long,
      eventTimeWatermark: Option[String])

  private val history = new ConcurrentLinkedQueue[BatchHealth]()

  override def onQueryStarted(event: QueryStartedEvent): Unit = ()

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    history.add(BatchHealth(
      Option(p.name).getOrElse(p.id.toString),
      p.batchId,
      p.numInputRows,
      p.batchDuration,
      Option(p.eventTime.get("watermark"))))
    while (history.size() > historySize) history.poll()

    // ---- gravity metric families from the progress event ----
    // stage counters: on Spark one micro-batch IS the
    // input→emitter→scheduler→output conveyor, so each stage handoff
    // counts the batch's rows (the reference increments per message at
    // each handoff — same totals, coarser increments)
    val rows = p.numInputRows
    if (rows > 0) {
      metrics.inc("gravity_input_counter",
        Seq("db" -> "", "table" -> "", "type" -> "dml", "subtype" -> ""), rows)
      metrics.inc("gravity_input_emitter_counter", Nil, rows)
      metrics.inc("gravity_emitter_scheduler_counter", Nil, rows)
      metrics.inc("gravity_scheduler_output_counter", Nil, rows)
    }
    val out = p.sink.numOutputRows
    if (out > 0) metrics.inc("gravity_output_counter",
      Seq("cat0" -> Option(p.name).getOrElse(""), "cat1" -> "", "cat2" -> "", "cat3" -> ""), out)
    // stage latencies from the batch's duration breakdown (seconds)
    val dur = p.durationMs
    def obs(metric: String, keys: String*): Unit = {
      val ms = keys.flatMap(k => Option(dur.get(k)).map(_.longValue())).sum
      if (keys.exists(k => dur.containsKey(k)))
        metrics.observe(metric, ms / 1000.0)
    }
    obs("gravity_input_latency", "getBatch", "latestOffset")
    obs("gravity_emitter_latency", "queryPlanning")
    obs("gravity_output_latency", "addBatch")
    obs("gravity_scheduler_total_latency", "walCommit", "commitOffsets")
    obs("gravity_process_time_latency", "triggerExecution")
    // watermark lag = end-to-end event-time latency
    Option(p.eventTime.get("watermark")).foreach { wm =>
      try {
        val lagS = (System.currentTimeMillis() -
          java.time.Instant.parse(wm).toEpochMilli) / 1000.0
        metrics.observe("gravity_event_time_latency", math.max(0.0, lagS))
      } catch { case _: java.time.format.DateTimeParseException => () }
    }
    // state rows as the queue-depth gauge
    val stateRows = p.stateOperators.map(_.numRowsTotal).sum
    if (p.stateOperators.nonEmpty) metrics.setGauge("gravity_queue_length",
      stateRows.toDouble, Seq("type" -> "state", "subtype" -> Option(p.name).getOrElse("")))
  }

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()

  def batches: Seq[BatchHealth] = history.asScala.toSeq

  /** Unhealthy when recent batches exceed the commit-lag threshold — the
    * analogue of the reference's HealthyThreshold check.
    */
  def healthy: Boolean =
    batches.takeRight(3).forall(_.batchDurationMs < unhealthyAfterMs)

  /** The `/status` payload analogue (core.Msg TaskReportStatus,
    * pkg/core/msg.go:194-201).
    */
  def statusReport: Map[String, Any] = {
    val bs = batches
    Map(
      "healthy" -> healthy,
      "batches_seen" -> bs.size,
      "last_batch_id" -> bs.lastOption.map(_.batchId).getOrElse(-1L),
      "last_watermark" -> bs.lastOption.flatMap(_.eventTimeWatermark).getOrElse(""),
      "total_rows" -> bs.map(_.numInputRows).sum)
  }
}
