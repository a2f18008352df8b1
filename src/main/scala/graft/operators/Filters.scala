package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** The filter chain: each filter is a `DataFrame => DataFrame` transform,
  * applied in configured order (reference: pkg/emitter/emitter.go:52-65
  * runs filters in order; returning continueNext=false drops the message).
  *
  * Every filter gates on a matcher group, i.e. semantically
  * `CASE WHEN matched THEN transform/drop ELSE passthrough` — which is
  * exactly how these compile: conditional Column expressions, never a
  * row-at-a-time callback, so the whole chain stays in one codegen stage.
  */
sealed trait TransformOp {
  def apply(df: DataFrame): DataFrame
}

/** Drop rows matching the group (blacklist) —
  * /root/reference pkg/filters/reject_filter.go:25-31.
  */
final case class RejectFilter(matchers: Seq[Matcher]) extends TransformOp {
  def apply(df: DataFrame): DataFrame = df.filter(!Matcher.group(matchers))
}

/** Keep only rows matching the group (whitelist) —
  * pkg/filters/accept_filter.go:24-29.
  */
final case class AcceptFilter(matchers: Seq[Matcher]) extends TransformOp {
  def apply(df: DataFrame): DataFrame = df.filter(Matcher.group(matchers))
}

/** Delete named columns from the payload
  * (pkg/filters/delete_dml_column_filter.go:52-75).
  *
  * Typed streams: plain `drop` (columns pruned all the way to the scan).
  * Map-encoded envelopes: `map_filter` over data/old/pks, conditionally per
  * matcher group so unmatched tables pass through untouched.
  */
final case class DeleteColumnsFilter(columns: Seq[String],
    matchers: Seq[Matcher] = Nil, enveloped: Boolean = false) extends TransformOp {
  def apply(df: DataFrame): DataFrame =
    if (!enveloped) df.drop(columns: _*)
    else {
      val pred = Matcher.group(matchers)
      val keys = array(columns.map(lit): _*)
      def prune(c: String): Column =
        when(pred && col(c).isNotNull,
          map_filter(col(c), (k, _) => !array_contains(keys, k)))
          .otherwise(col(c))
      df.withColumn("data", prune("data"))
        .withColumn("old", prune("old"))
        .withColumn("pks", prune("pks"))
    }
}

/** Rename payload columns from(i) → to(i)
  * (pkg/filters/rename_dml_column_filter.go:77-110).
  */
final case class RenameColumnsFilter(from: Seq[String], to: Seq[String],
    matchers: Seq[Matcher] = Nil, enveloped: Boolean = false) extends TransformOp {
  require(from.length == to.length, "rename: from/to arity mismatch")
  private val mapping = from.zip(to).toMap

  def apply(df: DataFrame): DataFrame =
    if (!enveloped) mapping.foldLeft(df) { case (d, (f, t)) => d.withColumnRenamed(f, t) }
    else {
      val pred = Matcher.group(matchers)
      val renameKey: (Column, Column) => Column = (k, _) =>
        mapping.foldLeft(k) { case (acc, (f, t)) => when(k === f, lit(t)).otherwise(acc) }
      def ren(c: String): Column =
        when(pred && col(c).isNotNull, transform_keys(col(c), renameKey)).otherwise(col(c))
      df.withColumn("data", ren("data"))
        .withColumn("old", ren("old"))
        .withColumn("pks", ren("pks"))
    }
}

/** SQL-expression transform — the superset filter: add/replace a column
  * with any Catalyst expression (the reference delegates anything beyond
  * rename/delete to an external gRPC process, pkg/filters/grpc_sidecar_filter.go;
  * in Spark the whole functions._ surface is available declaratively).
  */
final case class ExprTransform(column: String, sql: String) extends TransformOp {
  def apply(df: DataFrame): DataFrame = df.withColumn(column, expr(sql))
}

/** Escape hatch mirroring grpc-sidecar (pkg/filters/grpc_sidecar_filter.go:83-133):
  * a user function Row => Option[Row] applied per-partition. Last resort —
  * breaks codegen; prefer ExprTransform.
  */
final case class UserFilter(fn: Row => Option[Row]) extends TransformOp {
  def apply(df: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(df.schema)
    df.mapPartitions(_.flatMap(fn(_)))(enc)
  }
}

/** Sidecar with a REAL process boundary — the reference ships each DmlMsg
  * to a user binary over gRPC which may mutate or drop it
  * (pkg/filters/grpc_sidecar_filter.go:83-133; protocol/msgpb). The
  * transport here is the universal one a Spark cluster always has: one
  * sidecar process per partition on the executor, rows streamed to its
  * stdin as JSON lines, transformed (or omitted = dropped) JSON lines read
  * back from stdout, re-parsed against the input schema. A non-zero exit
  * fails the task (Spark retries it).
  */
final case class ProcessSidecarFilter(command: Seq[String]) extends TransformOp {
  def apply(df: DataFrame): DataFrame = {
    val schema = df.schema
    val spark = df.sparkSession
    import spark.implicits._
    val jsonIn = df.select(to_json(struct(df.columns.map(col): _*)).as("j")).as[String]
    val cmd = command
    val jsonOut = jsonIn.mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else {
        // stderr must drain or a chatty sidecar fills the pipe buffer and
        // deadlocks all three parties; inherit routes it to executor logs
        val proc = new ProcessBuilder(cmd: _*)
          .redirectError(ProcessBuilder.Redirect.INHERIT)
          .start()
        // the writer thread consumes the UPSTREAM iterator: it needs the
        // task context (thread-local; shuffle readers read it), and its
        // failures must fail the task — an uncaught throw would just kill
        // the thread, close stdin, and let the sidecar exit 0 having seen
        // a clean EOF after only part of the input (silent row loss)
        val taskCtx = org.apache.spark.TaskContext.get()
        // a failed/killed/short-circuited task must not orphan the child
        if (taskCtx != null)
          taskCtx.addTaskCompletionListener[Unit](_ => proc.destroyForcibly())
        @volatile var writerFailure: Throwable = null
        val writer = new Thread(() => {
          if (taskCtx != null) org.apache.spark.graft.TaskContextBridge.set(taskCtx)
          val w = new java.io.OutputStreamWriter(proc.getOutputStream, "UTF-8")
          try it.foreach { l => w.write(l); w.write('\n') }
          catch { case t: Throwable => writerFailure = t }
          finally w.close() // EOF tells the sidecar to finish
        })
        writer.setDaemon(true)
        writer.start()
        val lines = scala.io.Source.fromInputStream(proc.getInputStream, "UTF-8").getLines()
        new Iterator[String] {
          private var finished = false
          def hasNext: Boolean = {
            val h = lines.hasNext
            if (!h && !finished) {
              finished = true
              writer.join()
              val rc = proc.waitFor()
              // a sidecar may legitimately stop reading early (head -n
              // style sampling) — the writer's broken pipe is benign IFF
              // the sidecar then exited clean; anything else is row loss
              val benignEarlyExit = rc == 0 &&
                writerFailure.isInstanceOf[java.io.IOException]
              if (writerFailure != null && !benignEarlyExit)
                throw new RuntimeException("sidecar input writer failed", writerFailure)
              if (rc != 0) sys.error(s"sidecar ${cmd.mkString(" ")} exited $rc")
            }
            h
          }
          def next(): String = lines.next()
        }
      }
    }
    jsonOut.toDF("j")
      .select(from_json(col("j"), schema).as("r"))
      .select(col("r.*"))
  }
}

/** Fill columns present in the target schema but absent in the frame with
  * defaults/NULL (reference output-side AddMissingColumn,
  * pkg/outputs/mysql/add_missing_column.go:10-30).
  */
final case class AddMissingColumns(targetSchema: org.apache.spark.sql.types.StructType,
    defaults: Map[String, Any] = Map.empty) extends TransformOp {
  def apply(df: DataFrame): DataFrame = {
    // case-insensitive presence check: introspected target schemas come
    // back in the target's identifier case (Derby folds to upper) while
    // the stream's columns don't — Spark resolves references across case,
    // so adding an "ID" twin of "id" would make every reference ambiguous
    val present = df.columns.map(_.toLowerCase).toSet
    targetSchema.fields.filterNot(f => present(f.name.toLowerCase)).foldLeft(df) { (d, f) =>
      val v = defaults.get(f.name).map(lit).getOrElse(lit(null))
      d.withColumn(f.name, v.cast(f.dataType))
    }
  }
}

object TransformChain {
  /** Compose a filter chain in configured order (emitter.go:52-65). */
  def apply(ops: Seq[TransformOp]): DataFrame => DataFrame =
    df => ops.foldLeft(df)((d, op) => op(d))
}

/** Sidecar filter speaking gravity's OWN filter-plugin wire contract
  * (protocol/msgpb/message.proto): every row crosses the process boundary
  * as a protobuf `FilterRequest{Msg}` frame and returns as a
  * `FilterResponse{Msg, continueNext, error}` — the msgpb bytes a user
  * filter binary written against gravity's schema exchanges, carried over
  * varint-framed stdin/stdout instead of go-plugin's gRPC session
  * (pkg/filters/grpc_sidecar_filter.go:83-133; [[MsgPb]] has the codec).
  *
  * Semantics match GRPCClient.Filter (pkg/filters/grpc/client.go:52-83):
  * the response's DmlMsg replaces the row's op/data/old/pks; header and
  * passthrough columns (seq, database, table, …) stay the ORIGINAL row's;
  * continueNext=false drops the row; a response error fails the task.
  *
  * Expected envelope columns: `op` string, `data`/`old`/`pks`
  * map<string,string>; `database`/`table` string if present ride the
  * request header. Everything else passes through untouched.
  */
final case class MsgPbSidecarFilter(command: Seq[String],
    version: String = "2.0.alpha") extends TransformOp {
  def apply(df: DataFrame): DataFrame = {
    import graft.operators.MsgPb
    val schema = df.schema
    val spark = df.sparkSession
    val names = schema.fieldNames
    def idxOf(n: String): Int = names.indexOf(n)
    val (iDb, iTable, iOp) = (idxOf("database"), idxOf("table"), idxOf("op"))
    val (iData, iOld, iPks) = (idxOf("data"), idxOf("old"), idxOf("pks"))
    require(iOp >= 0 && iData >= 0 && iOld >= 0 && iPks >= 0,
      "msgpb sidecar expects envelope columns op, data, old, pks")
    val cmd = command
    val ver = version
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val out = df.mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else {
        // shared with GrpcSidecarFilter — one conversion, two transports
        def strMap(row: Row, i: Int): MsgPb.PbMap = MsgPb.rowStrMap(row, i)
        def backToString(v: MsgPb.PbValue): String = MsgPb.valueToString(v)
        val proc = new ProcessBuilder(cmd: _*)
          .redirectError(ProcessBuilder.Redirect.INHERIT)
          .start()
        // one response per request, in order (the synchronous Filter rpc's
        // contract) — original rows wait here for their response; the
        // bound caps writer run-ahead so the queue can't grow unboundedly
        val pending = new java.util.concurrent.LinkedBlockingQueue[Row](1024)
        val taskCtx = org.apache.spark.TaskContext.get()
        // failure paths (response error, task kill, a downstream limit()
        // that stops draining) must not orphan the child process
        if (taskCtx != null)
          taskCtx.addTaskCompletionListener[Unit](_ => proc.destroyForcibly())
        @volatile var writerFailure: Throwable = null
        val writer = new Thread(() => {
          if (taskCtx != null) org.apache.spark.graft.TaskContextBridge.set(taskCtx)
          val os = new java.io.BufferedOutputStream(proc.getOutputStream)
          try it.foreach { row =>
            pending.put(row)
            val msg = MsgPb.Msg(
              version = ver,
              database = if (iDb >= 0 && !row.isNullAt(iDb)) row.getString(iDb) else "",
              table = if (iTable >= 0 && !row.isNullAt(iTable)) row.getString(iTable) else "",
              msgType = "dml",
              dml = Some(MsgPb.Dml(
                op = if (row.isNullAt(iOp)) "" else row.getString(iOp),
                data = strMap(row, iData), old = strMap(row, iOld),
                pks = strMap(row, iPks))))
            MsgPb.writeFrame(os, MsgPb.encodeFilterRequest(msg))
          }
          catch { case t: Throwable => writerFailure = t }
          finally { try os.close() catch { case _: java.io.IOException => () } }
        })
        writer.setDaemon(true)
        writer.start()
        val is = new java.io.BufferedInputStream(proc.getInputStream)
        new Iterator[Row] {
          private var nextRow: Row = null
          private var finished = false
          private def advance(): Unit = {
            while (nextRow == null && !finished) {
              MsgPb.readFrame(is) match {
                case None =>
                  finished = true
                  // the writer may be parked in pending.put (sidecar died
                  // with >capacity rows in flight) — drain until it exits
                  // so join() can't hang, counting what was never answered
                  var unanswered = 0
                  while (writer.isAlive)
                    if (pending.poll(50,
                      java.util.concurrent.TimeUnit.MILLISECONDS) != null) unanswered += 1
                  writer.join()
                  while (pending.poll() != null) unanswered += 1
                  val rc = proc.waitFor()
                  // unlike the JSON sidecar there is NO benign early exit:
                  // the msgpb contract is one response per request, so any
                  // unanswered row is silent data loss, not sampling
                  if (writerFailure != null &&
                      !writerFailure.isInstanceOf[java.io.IOException])
                    throw new RuntimeException("msgpb sidecar writer failed", writerFailure)
                  if (rc != 0) sys.error(s"msgpb sidecar ${cmd.mkString(" ")} exited $rc")
                  if (unanswered > 0 || writerFailure != null) sys.error(
                    s"msgpb sidecar ${cmd.mkString(" ")} exited ($rc) leaving " +
                      s"$unanswered request(s) unanswered — one-response-per-request " +
                      "contract violated")
                case Some(frame) =>
                  val orig = pending.take()
                  val rsp = MsgPb.decodeFilterResponse(frame)
                  rsp.error.foreach(e => sys.error(s"msgpb sidecar filter error: $e"))
                  if (rsp.continueNext) {
                    val dml = rsp.msg.flatMap(_.dml).getOrElse(
                      sys.error("msgpb sidecar: continueNext without a DmlMsg"))
                    val vals = new Array[Any](names.length)
                    var i = 0
                    while (i < names.length) { vals(i) = orig.get(i); i += 1 }
                    vals(iOp) = dml.op
                    vals(iData) = dml.data.map { case (k, v) => k -> backToString(v) }.toMap
                    vals(iOld) = dml.old.map { case (k, v) => k -> backToString(v) }.toMap
                    vals(iPks) = dml.pks.map { case (k, v) => k -> backToString(v) }.toMap
                    nextRow = Row.fromSeq(vals.toIndexedSeq)
                  }
              }
            }
          }
          def hasNext: Boolean = { advance(); nextRow != null }
          def next(): Row = {
            advance()
            val r = nextRow; nextRow = null
            if (r == null) throw new NoSuchElementException
            r
          }
        }
      }
    }(enc)
    out
  }
}

/** Sidecar filter over gravity's ACTUAL plugin transport: per partition,
  * launch the plugin binary through the go-plugin handshake
  * ([[GrpcPluginClient]] — magic cookie env, handshake line, gRPC/h2c
  * dial) and make one synchronous gRPC Filter call per row — exactly
  * GRPCClient.Filter's shape (pkg/filters/grpc/client.go:52-83). Row
  * semantics match [[MsgPbSidecarFilter]]: the response DmlMsg replaces
  * op/data/old/pks, continueNext=false drops the row, a response error
  * fails the task. Configure runs once per plugin launch with the
  * filter's config map, as the reference host does on Dispense.
  */
final case class GrpcSidecarFilter(command: Seq[String],
    version: String = "2.0.alpha",
    configureData: Map[String, String] = Map.empty) extends TransformOp {
  def apply(df: DataFrame): DataFrame = {
    val schema = df.schema
    val names = schema.fieldNames
    def idxOf(n: String): Int = names.indexOf(n)
    val (iDb, iTable, iOp) = (idxOf("database"), idxOf("table"), idxOf("op"))
    val (iData, iOld, iPks) = (idxOf("data"), idxOf("old"), idxOf("pks"))
    require(iOp >= 0 && iData >= 0 && iOld >= 0 && iPks >= 0,
      "grpc sidecar expects envelope columns op, data, old, pks")
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val (cmd, ver, conf) = (command, version, configureData)
    df.mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else {
        val plugin = new GrpcPluginClient(cmd)
        val taskCtx = org.apache.spark.TaskContext.get()
        if (taskCtx != null)
          taskCtx.addTaskCompletionListener[Unit](_ => plugin.destroy())
        require(plugin.healthCheck(), "grpc sidecar health check not SERVING")
        plugin.configure(conf.toSeq.map { case (k, v) =>
          k -> (MsgPb.PbValue.Str(v): MsgPb.PbValue) })
        it.flatMap { row =>
          val msg = MsgPb.Msg(
            version = ver,
            database = if (iDb >= 0 && !row.isNullAt(iDb)) row.getString(iDb) else "",
            table = if (iTable >= 0 && !row.isNullAt(iTable)) row.getString(iTable) else "",
            msgType = "dml",
            dml = Some(MsgPb.Dml(
              op = if (row.isNullAt(iOp)) "" else row.getString(iOp),
              data = MsgPb.rowStrMap(row, iData),
              old = MsgPb.rowStrMap(row, iOld),
              pks = MsgPb.rowStrMap(row, iPks))))
          val rsp = plugin.filter(msg)
          rsp.error.foreach(e => sys.error(s"grpc sidecar filter error: $e"))
          if (!rsp.continueNext) None
          else {
            val dml = rsp.msg.flatMap(_.dml).getOrElse(
              sys.error("grpc sidecar: continueNext without a DmlMsg"))
            val vals = new Array[Any](names.length)
            var i = 0
            while (i < names.length) { vals(i) = row.get(i); i += 1 }
            vals(iOp) = dml.op
            vals(iData) = dml.data.map { case (k, v) => k -> MsgPb.valueToString(v) }.toMap
            vals(iOld) = dml.old.map { case (k, v) => k -> MsgPb.valueToString(v) }.toMap
            vals(iPks) = dml.pks.map { case (k, v) => k -> MsgPb.valueToString(v) }.toMap
            Some(Row.fromSeq(vals.toIndexedSeq))
          }
        }
      }
    }(enc)
  }
}
