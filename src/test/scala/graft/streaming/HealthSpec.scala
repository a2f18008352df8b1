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
}
