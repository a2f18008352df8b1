package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The streaming quantile processor in the LOSSY regime (k ≪ n) the
  * oracle entry cannot gate: state stays sketch-sized across
  * micro-batches, the final snapshot's rank error is inside the ε
  * envelope, and per-group streams are independent.
  */
class StreamingQuantilesSpec extends SparkSpec {

  private def drain(in: DataFrame, k: Int, probes: Seq[Double],
      work: String): DataFrame = {
    val s = in.sparkSession
    val stream = s.readStream.schema(in.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$work/in")
    val sk = StreamingQuantiles.sketch(stream, k, probes).toDF("grp", "n", "qs")
    withRocksDbStateStore {
      val q = sk.writeStream
        .foreachBatch((b: DataFrame, id: Long) =>
          b.withColumn("batch", lit(id)).write.mode("append")
            .parquet(s"$work/out"))
        .outputMode("update")
        .option("checkpointLocation", s"$work/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      withStream(q)(q.awaitTermination())
    }
    val snaps = spark.read.parquet(s"$work/out")
    val lastB = snaps.groupBy("grp").agg(max(col("batch")).as("batch"))
    snaps.join(lastB, Seq("grp", "batch"))
  }

  test("lossy streaming sketch: rank error inside the envelope, count exact") {
    import spark.implicits._
    val n = 20000
    // two groups with DIFFERENT distributions: g0 = 0..n-1, g1 = evens
    val rows = (0 until n).flatMap(i =>
      Seq(("g0", i.toLong), ("g1", 2L * i)))
    val work = java.nio.file.Files.createTempDirectory("squant-lossy").toString
    val in = rows.toDF("grp", "v").repartition(8)
    in.write.mode("overwrite").parquet(s"$work/in")
    val out = drain(in, k = 128, probes = Seq(0.25, 0.5, 0.75), work)
      .collect().map(r => r.getAs[String]("grp") ->
        (r.getAs[Long]("n"), r.getAs[scala.collection.Seq[Long]]("qs").toSeq)).toMap
    assert(out.keySet == Set("g0", "g1"))
    Seq("g0" -> 1L, "g1" -> 2L).foreach { case (g, scale) =>
      val (cnt, qs) = out(g)
      assert(cnt == n.toLong, s"$g count")
      Seq(0.25, 0.5, 0.75).zip(qs).foreach { case (q, est) =>
        // value v has rank v/scale + 1; envelope: ~ n·H/k with H = #levels
        val rank = est / scale + 1
        val target = math.ceil(q * n).toLong
        assert(math.abs(rank - target) <= (n * 0.05).toLong,
          s"$g q=$q est=$est rank=$rank target=$target")
      }
    }
  }

  test("exact regime snapshot equals a batch discrete quantile") {
    import spark.implicits._
    val rows = (0 until 999).map(i => ("g", ((i * 7919) % 1000).toLong))
    val work = java.nio.file.Files.createTempDirectory("squant-exact").toString
    val in = rows.toDF("grp", "v").repartition(4)
    in.write.mode("overwrite").parquet(s"$work/in")
    val out = drain(in, k = 2048, probes = Seq(0.5), work).collect()
    assert(out.length == 1)
    val sortedVals = rows.map(_._2).sorted
    val expected = sortedVals((math.ceil(0.5 * rows.size) - 1).toInt)
    assert(out.head.getAs[scala.collection.Seq[Long]]("qs").toSeq == Seq(expected))
    assert(out.head.getAs[Long]("n") == rows.size.toLong)
  }
}
