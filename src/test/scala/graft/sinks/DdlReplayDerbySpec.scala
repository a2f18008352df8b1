package graft.sinks

import graft.SparkSpec
import graft.streaming.{JdbcDdlExecutor, PipelineRunner, PipelinePlan}
import org.apache.spark.sql.functions._

/** DDL replay against a REAL target database: the control row flows
  * through the pipeline, is rewritten in the executor's dialect, ALTERs
  * Derby before the batch's DML, replays idempotently, and the live
  * schema catalog re-introspects the evolved table (the reference's
  * executeDDL + invalidate loop, mysql.go:246-392 +
  * binlog_tailer.go:455).
  */
class DdlReplayDerbySpec extends SparkSpec {
  import spark.implicits._

  test("ALTER flows through the pipeline into Derby, replays idempotently, catalog re-fetches") {
    val url = "jdbc:derby:memory:ddl" +
      java.util.UUID.randomUUID().toString.replace("-", "") + ";create=true"
    val c = java.sql.DriverManager.getConnection(url)
    try c.createStatement().execute(
      "CREATE TABLE t1 (id BIGINT NOT NULL PRIMARY KEY, v VARCHAR(8))")
    finally c.close()

    val plan = PipelinePlan(
      name = "ddl-replay",
      router = Some(graft.operators.Router.mysql(Seq(graft.operators.Route(
        Seq(graft.operators.SchemaMatcher("db*")),
        Map("schema" -> "", "table" -> "t1"))))),
      pkCols = Seq("id"),
      checkpoint = "")
    val sink = new JdbcBatchSink(
      () => new JdbcStatementExecutor(url),
      AnsiMergeEngine(Seq("id")), Seq("id"),
      targets = Seq(("", "t1")),
      // target-schema reconciliation projects away the envelope columns
      // (database/table/type/ddl_statement) before rendering
      targetSchemas = Map(("", "t1") -> org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.StringType)))),
      numWriters = Some(1))
    val ddlExec = new JdbcDdlExecutor(url, quote = "") // Derby: bare ids

    val batch = Seq(
      (1L, "insert", "db0", "t", "dml", null.asInstanceOf[String], 1L, "a"),
      (2L, "ddl", "db0", "t", "ddl", "ALTER TABLE t ADD COLUMN extra INT", 0L, null.asInstanceOf[String]),
      (3L, "update", "db0", "t", "dml", null.asInstanceOf[String], 1L, "b"))
      .toDF("seq", "op", "database", "table", "type", "ddl_statement", "id", "v")

    PipelineRunner.applyBatch(plan, sink, Some(ddlExec))(batch, 0)

    // the evolved table took the DML, and the live catalog sees EXTRA
    val cat = graft.core.JdbcSchemaIntrospector.catalog(() =>
      java.sql.DriverManager.getConnection(url))
    assert(cat.schemaOf("", "T1").fieldNames.toSeq == Seq("ID", "V", "EXTRA"))
    def state(): Map[Long, String] = {
      val c2 = java.sql.DriverManager.getConnection(url)
      try {
        val rs = c2.createStatement().executeQuery("SELECT id, v FROM t1")
        val out = scala.collection.mutable.Map.empty[Long, String]
        while (rs.next()) out(rs.getLong(1)) = rs.getString(2)
        out.toMap
      } finally c2.close()
    }
    assert(state() == Map(1L -> "b"))

    // foreachBatch replay: the duplicate-column ALTER is swallowed
    // (X0Y32), the DML re-applies idempotently
    PipelineRunner.applyBatch(plan, sink, Some(ddlExec))(batch, 0)
    assert(state() == Map(1L -> "b"))
  }
}
