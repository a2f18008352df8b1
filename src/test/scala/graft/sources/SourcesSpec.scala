package graft.sources

import graft.SparkSpec
import graft.sinks.KafkaJson
import org.apache.spark.sql.functions._

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("kafka v0.1 wire format round-trips encode -> decode") {
    val env = Seq(
      (1L, "insert", "dbx", "users",
        java.sql.Timestamp.valueOf("2024-01-02 03:04:05"),
        Map("id" -> "1", "name" -> "n"), Map.empty[String, String], Map("id" -> "1")),
      (2L, "delete", "dbx", "users",
        java.sql.Timestamp.valueOf("2024-01-02 03:04:06"),
        Map("id" -> "2"), Map.empty[String, String], Map("id" -> "2")))
      .toDF("seq", "op", "database", "table", "event_ts", "data", "old", "pks")

    val encoded = env.select(col("seq"), KafkaJson.valueV01("h1").as("value"))
    val decoded = KafkaCdc.envelopeFromV01(encoded, col("seq"))

    val back = decoded.select("seq", "op", "database", "table", "event_ts", "data", "pks")
      .as[(Long, String, String, String, java.sql.Timestamp, Map[String, String], Map[String, String])]
      .collect().sortBy(_._1)
    assert(back(0) == (1L, "insert", "dbx", "users",
      java.sql.Timestamp.valueOf("2024-01-02 03:04:05"), Map("id" -> "1", "name" -> "n"), Map("id" -> "1")))
    assert(back(1)._2 == "delete" && back(1)._6 == Map("id" -> "2"))
  }

  test("internal traffic elision drops own replication writes") {
    val df = Seq(("_graft", 1L), ("app", 2L), ("_graft_positions", 3L))
      .toDF("database", "seq")
    assert(KafkaCdc.dropInternalTraffic(df).select("seq").as[Long].collect().toSeq == Seq(2L))
  }

  test("pk-sticky partitioning assigns stable partitions") {
    val df = Seq((1L, "a"), (1L, "b"), (2L, "c")).toDF("id", "v")
    val parts = df.select(col("id"), KafkaCdc.partitionFor(Seq("id"), 16).as("p"))
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
    assert(parts(1L).length == 1) // same key, same partition
    assert(parts.values.flatten.forall(p => p >= 0 && p < 16))
  }

  test("numeric keyset predicates cover the range without overlap") {
    val preds = JdbcChunkedSource.numericPredicates("id", 0, 99, 4)
    assert(preds.size == 4)
    assert(preds.head == "id >= 0 AND id <= 24")
    assert(preds.last == "id >= 75 AND id <= 99")
    // simulated execution covers every key exactly once
    val keys = (0L to 99L)
    val covered = preds.flatMap { p =>
      val bounds = """(\d+)""".r.findAllIn(p).map(_.toLong).toSeq
      keys.filter(k => k >= bounds(0) && k <= bounds(1))
    }
    assert(covered.sorted == keys.toSeq)
  }

  test("quantile predicates split a skewed frame into parseable ranges") {
    val df = (Seq.fill(900)(5L) ++ (1L to 100L)).toDF("id")
    val preds = JdbcChunkedSource.quantilePredicates(df, "id", 4)
    assert(preds.nonEmpty && preds.forall(p => p.contains("id") || p == "1=1"))
  }
}
