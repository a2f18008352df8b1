package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Kafka write path in file form: toKafkaFrame → key-hash partitioned
  * append log → per-key total order across micro-batches (the broker
  * guarantee the reference's manual partitioner relies on,
  * async_kafka.go:196-201).
  */
class KafkaFileE2eSpec extends SparkSpec {
  import spark.implicits._

  test("one key's changes land totally ordered in one partition across batches") {
    val dir = java.nio.file.Files.createTempDirectory("kafka-log").toString
    val sink = new FileKafkaSink(dir, numPartitions = 4)

    def frame(rows: Seq[(Long, String, Long, String)]) = {
      val df = rows.toDF("seq", "op", "id", "v")
        .withColumn("database", lit("db0")).withColumn("table", lit("t"))
      KafkaJson.toKafkaFrame(df,
        value = to_json(struct(col("seq"), col("id"), col("op"), col("v"))),
        pkCols = Seq("id"),
        topic = concat_ws(".", col("database"), col("table")))
    }

    // two micro-batches, interleaved keys, multiple changes per key
    sink.write(0L, frame(Seq(
      (1L, "insert", 1L, "a"), (2L, "insert", 2L, "b"),
      (3L, "update", 1L, "a2"), (4L, "insert", 3L, "c"))))
    sink.write(1L, frame(Seq(
      (5L, "update", 2L, "b2"), (6L, "delete", 1L, "a2"),
      (7L, "update", 3L, "c2"))))

    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val logs: Map[Long, Seq[(Long, Long)]] = sink.partitions.map { p =>
      p -> sink.partitionLog(p).map { line =>
        val n = mapper.readTree(line)
        (n.get("id").asLong(), n.get("seq").asLong())
      }
    }.toMap

    val all = logs.values.flatten.toSeq
    assert(all.size == 7)
    // every key lives in exactly one partition
    val homes = all.map(_._1).distinct.map { id =>
      id -> logs.filter(_._2.exists(_._1 == id)).keys.toSeq
    }
    assert(homes.forall(_._2.size == 1), s"key spread across partitions: $homes")
    // within its partition log, each key's seqs are strictly ascending
    logs.foreach { case (p, entries) =>
      entries.groupBy(_._1).foreach { case (id, es) =>
        val seqs = es.map(_._2)
        assert(seqs == seqs.sorted, s"key $id out of order in p$p: $seqs")
      }
    }
    // batch 0's records precede batch 1's in every partition log
    logs.foreach { case (_, entries) =>
      val batchOf = entries.map(_._2).map(s => if (s <= 4) 0 else 1)
      assert(batchOf == batchOf.sorted)
    }
  }
}
