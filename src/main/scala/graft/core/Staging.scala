package graft.core

/** Stages the micro-batch input files of the streaming serving entries.
  *
  * Every staged-stream entry used to run one coalesce(1) write job PER
  * batch (plus a listing and a rename each) to lay out
  * `<work>/in/b00.parquet, b01.parquet, ...` with strictly increasing
  * modified times (the file-stream source orders by mtime, so
  * maxFilesPerTrigger=1 replays them as batches 0..N). At four batches a
  * site paid four scans of its source frames and four write jobs for a
  * few hundred KB of input. [[stage]] writes every batch in ONE job — the
  * frames union with a literal partition column, one task writes one file
  * per batch — and then moves each file into place. Byte content per
  * batch is unchanged (same rows, partition column excluded from the
  * file), so the streams' batch structure and results are identical.
  */
object Staging {

  /** Write `batches(i)` → `<work>/in/b%02d.parquet` with mtime
    * 1000000 + i·1000 ms (the convention every consumer pins), in one
    * Spark job. Batches must share a schema. An EMPTY batch still stages
    * — partitionBy writes no directory for it, so it falls back to its
    * own zero-row write (the file must exist for the stream to fire that
    * trigger). Returns the input directory path.
    */
  def stage(work: String, batches: Seq[org.apache.spark.sql.DataFrame]): String = {
    import org.apache.spark.sql.functions._
    require(batches.nonEmpty, "stage: at least one batch")
    val stageDir = s"$work/stageall"
    Prof.time("staging/write") {
      batches.zipWithIndex
        .map { case (df, i) => df.withColumn("__pfile", lit(i)) }
        .reduce(_.unionByName(_))
        .coalesce(1).write.mode("overwrite").partitionBy("__pfile").parquet(stageDir)
    }
    val inPath = java.nio.file.Paths.get(s"$work/in")
    java.nio.file.Files.createDirectories(inPath)
    batches.indices.foreach { i =>
      val dir = new java.io.File(s"$stageDir/__pfile=$i")
      val partFile =
        if (dir.isDirectory)
          dir.listFiles()
            .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
            .headOption
        else None
      val src = partFile.getOrElse {
        val solo = s"$work/stagesolo$i"
        batches(i).coalesce(1).write.mode("overwrite").parquet(solo)
        new java.io.File(solo).listFiles()
          .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).head
      }
      val dest = inPath.resolve(f"b$i%02d.parquet")
      java.nio.file.Files.move(src.toPath, dest)
      java.nio.file.Files.setLastModifiedTime(dest,
        java.nio.file.attribute.FileTime.fromMillis(1000000L + i * 1000L))
    }
    s"$work/in"
  }
}
