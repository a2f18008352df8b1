package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Space-saving sketch bounds in the LOSSY regime (capacity < distinct
  * items): estimates never undercount, the error term brackets the
  * truth, every true heavy hitter survives, and state stays capacity-
  * bounded. The exact regime (capacity ≥ distinct) is oracle-gated by
  * `evt_streaming_topk_heavy_hitters`.
  */
class StreamingTopKSpec extends SparkSpec {
  import spark.implicits._

  test("space-saving bounds hold under capacity pressure, across micro-batches") {
    implicit val sc = spark.sqlContext
    withRocksDbStateStore {

    val capacity = 8
    // skewed synthetic stream: items 0..2 carry ~60% of the mass, the
    // tail spreads over 37 more — 40 distinct ≫ capacity 8; group b is
    // the same shape over a shifted item universe
    val rows = (0 until 4000).map { i =>
      val g = if (i % 2 == 0) "a" else "b"
      val item =
        if (i % 10 < 6) (i % 3).toLong
        else (3 + (i * 7919) % 37).toLong
      (g, if (g == "b") item + 100 else item)
    }
    val truth = rows.groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
    val nPerGroup = rows.groupBy(_._1).map { case (g, xs) => g -> xs.size.toLong }

    // capture each micro-batch's emission with its batch id — the
    // processor emits a FULL per-group snapshot whenever a group gets
    // rows, so a group's last-batch rows are its complete final state
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long, Long, Long)]
    val mem = MemoryStream[(String, Long)]
    val q = StreamingTopK.sketch(mem.toDS.toDF("grp", "item"), capacity)
      .toDF("grp", "item", "est", "err").writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch { (b: DataFrame, id: Long) =>
        val got = b.collect()
          .map(r => (id, r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        buf.synchronized { buf ++= got }
        ()
      }
      .start()

    val (h1, h2) = rows.splitAt(rows.length / 2)
    withStream(q) {
      mem.addData(h1)
      q.processAllAvailable()
      mem.addData(h2)
      q.processAllAvailable()
    }

    val lastBatch = buf.groupBy(_._2).map { case (g, xs) => g -> xs.map(_._1).max }
    val fin = buf.filter { case (id, g, _, _, _) => id == lastBatch(g) }
    assert(fin.nonEmpty && lastBatch.keySet == Set("a", "b"))
    fin.groupBy(_._2).foreach { case (g, entries) =>
      assert(entries.size <= capacity, s"group $g state ${entries.size} > $capacity")
      entries.foreach { case (_, _, item, est, err) =>
        val t = truth.getOrElse((g, item), 0L)
        assert(est >= t, s"($g,$item): est $est undercounts true $t")
        assert(est - err <= t, s"($g,$item): est-err ${est - err} > true $t")
      }
      // no false negatives for true heavy hitters (> n/capacity)
      val inSketch = entries.map(_._3).toSet
      truth.collect { case ((gg, it), t) if gg == g && t > nPerGroup(g) / capacity => it }
        .foreach(it => assert(inSketch.contains(it),
          s"group $g: true heavy hitter $it (> n/m) missing from sketch"))
      // capacity pressure actually happened: some error terms are nonzero
      assert(entries.exists(_._5 > 0), s"group $g: lossy regime not exercised")
    }
    }
  }
}
