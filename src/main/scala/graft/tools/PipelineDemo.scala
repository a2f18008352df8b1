package graft.tools

import graft.analytics.CdcQueries
import graft.core.Engine
import graft.operators.{AcceptFilter, SchemaMatcher}
import graft.sources.FileChangeLogSource
import graft.streaming.{PipelinePlan, PipelineRunner, SnapshotBatchSink}

/** End-to-end pipeline drive on real harness data: synthesize the orders
  * change-log at sf0.001, write it as a file change-log, run the streaming
  * pipeline (filter → per-key compaction → snapshot sink) through real
  * micro-batches, and print the materialized snapshot's shape.
  *
  * Usage: runMain graft.tools.PipelineDemo [sfDir] [workDir]
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val work = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("graft-demo").toString)
    val spark = Engine.local("pipeline-demo", cores = 4)

    val logDir = s"$work/changelog"
    // stage the synthetic change-log as files, 4 slices => >=4 micro-batches
    CdcQueries.envelope(spark, sfDir)
      .repartition(4).write.mode("overwrite").parquet(logDir)

    val schema = spark.read.parquet(logDir).schema
    val plan = PipelinePlan(
      name = "orders-replication",
      transforms = Seq(AcceptFilter(Seq(SchemaMatcher("db*")))),
      pkCols = Seq("o_orderkey"),
      checkpoint = s"$work/ckpt")
    val sink = new SnapshotBatchSink(spark, s"$work/snapshot", Seq("o_orderkey"))

    val q = PipelineRunner.start(plan,
      FileChangeLogSource.readStream(spark, logDir, schema, maxFilesPerTrigger = Some(1)),
      sink)
    q.awaitTermination()

    val snap = sink.read()
    val total = snap.count()
    // cross-check: incremental micro-batched application (files arrive in
    // arbitrary order!) must converge to the one-shot compaction
    val expected = graft.core.ChangeLog
      .compact(CdcQueries.changeLog(spark, sfDir), Seq("o_orderkey")).count()
    println(s"[demo] snapshot rows=$total, one-shot compaction rows=$expected, " +
      s"converged=${total == expected}")
    println(s"[demo] statuses=" + snap.groupBy("o_orderstatus").count().collect()
      .map(r => s"${r.get(0)}:${r.get(1)}").sorted.mkString(","))
    println(s"[demo] work dir: $work")
    if (total != expected) sys.error("pipeline did not converge to compaction oracle")
    spark.stop()
  }
}
