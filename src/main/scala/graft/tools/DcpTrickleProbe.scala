package graft.tools

import graft.core.Engine
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Per-batch floor profiler for the trickled dcp path: feeds the
  * barrier-segmented checker a long strictly-ordered sequence of TINY
  * micro-batches, so total time ≈ batches × per-batch overhead and the
  * data volume contributes ~nothing — isolating the state-store commit
  * cost the r07 trickled stress measured at a flat ~1.3 s/batch.
  *
  * Runs the SAME stream twice on cloned sessions: `default` (session
  * defaults: HDFS-backed state store, full shuffle-partition count) and
  * `tuned` (RocksDB provider + changelog checkpointing, state
  * partitions sized to parallelism actually useful at this key count) —
  * the comparison that decides whether the floor is engine-fixed.
  *
  * Usage: runMain graft.tools.DcpTrickleProbe [sfDir] [barrierSize]
  */
object DcpTrickleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val perBarrier = args.lift(1).map(_.toInt).getOrElse(100)
    val spark = Engine.session("dcp-trickle-probe",
      master = Some(s"local[${Engine.defaultShufflePartitions}]"))

    def run(label: String, tuned: Boolean): Unit = {
      val s = spark.newSession()
      if (tuned) {
        s.conf.set("spark.sql.shuffle.partitions", "8")
        s.conf.set("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        s.conf.set(
          "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
          "true")
      }
      val work = graft.analytics.Q.scratch(s"dcpprobe-$label")
      val chk = md5(concat_ws("|", col("op"), col("o_orderkey"),
        col("o_orderstatus")))
      val base = graft.analytics.CdcQueries.changeLog(s, sfDir).select(
        expr(s"seq div $perBarrier").cast("long").as("barrier"),
        col("o_orderkey").cast("string").as("payload_id"),
        col("seq").as("ord"), chk.as("checksum"))
      val tagged = base.withColumn("tag", lit("src"))
        .unionByName(base.withColumn("tag", lit("dst")))
        .select(col("tag"), col("barrier"), col("payload_id"), col("ord"),
          col("checksum"))
      val maxB = base.agg(max(col("barrier"))).head.getLong(0)
      val nMsgs = 2L * base.count()
      val groups = tagged.withColumn("grp", (col("barrier") / 10).cast("long"))
      val stageDir = s"$work/stage"
      groups.repartition(col("grp")).write.partitionBy("grp")
        .mode("overwrite").parquet(stageDir)
      val inDir = java.nio.file.Paths.get(s"$work/in")
      java.nio.file.Files.createDirectories(inDir)
      val grpDirs = new java.io.File(stageDir).listFiles()
        .filter(_.getName.startsWith("grp="))
        .sortBy(_.getName.stripPrefix("grp=").toLong)
      grpDirs.zipWithIndex.foreach { case (dir, idx) =>
        dir.listFiles().filter(_.getName.endsWith(".parquet"))
          .zipWithIndex.foreach { case (f, j) =>
            val dest = inDir.resolve(f"g$idx%05d_$j.parquet")
            java.nio.file.Files.move(f.toPath, dest)
            java.nio.file.Files.setLastModifiedTime(dest,
              java.nio.file.attribute.FileTime.fromMillis(1000000L + idx * 1000L))
          }
      }
      val sentinels = s.createDataFrame(Seq(
        ("src", maxB + 1, "_close", 0L, "x"), ("dst", maxB + 1, "_close", 1L, "x")))
        .toDF("tag", "barrier", "payload_id", "ord", "checksum")
      val sentStage = s"$work/sent"
      sentinels.coalesce(1).write.mode("overwrite").parquet(sentStage)
      val sentPart = new java.io.File(sentStage).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).head
      val sentDest = inDir.resolve("zz_close.parquet")
      java.nio.file.Files.move(sentPart.toPath, sentDest)
      java.nio.file.Files.setLastModifiedTime(sentDest,
        java.nio.file.attribute.FileTime.fromMillis(
          1000000L + grpDirs.length * 1000L + 1000L))
      val stream = s.readStream.schema(sentinels.schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$work/in")
      val t0 = System.nanoTime()
      val q = StreamConsistency.segmentChecks(stream)
        .writeStream.format("parquet")
        .option("path", s"$work/out")
        .option("checkpointLocation", s"$work/ckpt")
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val verd = StreamConsistency.verdicts(
        s.read.parquet(s"$work/out"), "src", "dst")
      val same = verd.filter(col("status") === "same").count()
      val total = verd.count()
      val secs = (System.nanoTime() - t0) / 1e9
      val batches = grpDirs.length + 1
      println(f"[probe] $label%-8s $secs%8.2fs batches=$batches " +
        f"(${secs / batches}%.3f s/batch) msgs=$nMsgs segments=$total same=$same")
    }

    run("default", tuned = false)
    run("tuned", tuned = true)
    spark.stop()
  }
}
