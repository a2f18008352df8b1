package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChangeLogSpec extends SparkSpec {
  import spark.implicits._

  private def log(rows: (Long, String, Long, String)*) =
    rows.toSeq.toDF("seq", "op", "id", "v")

  test("compact keeps last image per key and drops deleted keys") {
    val l = log(
      (1, "insert", 1, "a"), (2, "update", 1, "b"),
      (3, "insert", 2, "x"), (4, "delete", 2, "x"),
      (5, "insert", 3, "z"))
    val got = ChangeLog.compact(l, Seq("id")).select("id", "v").as[(Long, String)]
      .collect().toSet
    assert(got == Set((1L, "b"), (3L, "z")))
  }

  test("lastPerKey keeps final op including deletes") {
    val l = log((1, "insert", 1, "a"), (2, "delete", 1, "a"), (3, "insert", 2, "b"))
    val got = ChangeLog.lastPerKey(l, Seq("id")).select("id", "op").as[(Long, String)]
      .collect().toSet
    assert(got == Set((1L, "delete"), (2L, "insert")))
  }

  test("splitPkUpdate emits delete(old)+insert(new), delete first") {
    val l = Seq(
      (1L, "insert", Option.empty[Long], 10L, "a"),
      (2L, "update", Some(10L), 11L, "a2"))
      .toDF("seq", "op", "old_id", "id", "v")
    val out = ChangeLog.splitPkUpdate(l, Seq("id"))
      .orderBy("seq").select("seq", "op", "id").as[(Long, String, Long)].collect().toSeq
    assert(out == Seq((2L, "insert", 10L), (4L, "delete", 10L), (5L, "insert", 11L)))
    // applying the split log yields only the new key
    val fin = ChangeLog.compact(ChangeLog.splitPkUpdate(l, Seq("id")), Seq("id"))
      .select("id").as[Long].collect().toSet
    assert(fin == Set(11L))
  }

  test("property: replaying a compacted log reproduces the snapshot (20 random workloads)") {
    val rnd = new scala.util.Random(42)
    val ops = Array("insert", "update", "delete")
    (1 to 20).foreach { _ =>
      val workload = (0 until 60).map { i =>
        (i.toLong, ops(rnd.nextInt(3)), (1 + rnd.nextInt(8)).toLong,
          rnd.alphanumeric.take(4).mkString)
      }
      val l = workload.toDF("seq", "op", "id", "v")
      val snap = ChangeLog.compact(l, Seq("id")).select("id", "v")
      val replay = snap.withColumn("op", lit("insert")).withColumn("seq", lit(0L))
      val snap2 = ChangeLog.compact(replay, Seq("id")).select("id", "v")
      assert(snap.as[(Long, String)].collect().toSet ==
        snap2.as[(Long, String)].collect().toSet)
    }
  }

  test("property: routed compaction per (target, pk) = per-target filter + compact (10 random workloads)") {
    // the pipeline compacts routed batches on (tgt_schema, tgt_table, pk):
    // one pk value flowing to two targets must be two independent keys —
    // equivalent to compacting each target's slice alone
    val rnd = new scala.util.Random(7)
    val ops = Array("insert", "update", "delete")
    (1 to 10).foreach { _ =>
      val workload = (0 until 80).map { i =>
        (i.toLong, ops(rnd.nextInt(3)), (1 + rnd.nextInt(6)).toLong,
          s"t${rnd.nextInt(2)}", rnd.alphanumeric.take(4).mkString)
      }
      val l = workload.toDF("seq", "op", "id", "tgt_table", "v")
      val joint = ChangeLog.compact(l, Seq("tgt_table", "id"))
        .select("tgt_table", "id", "v").as[(String, Long, String)].collect().toSet
      val sliced = Seq("t0", "t1").flatMap { t =>
        ChangeLog.compact(l.filter($"tgt_table" === t), Seq("id"))
          .select("tgt_table", "id", "v").as[(String, Long, String)].collect()
      }.toSet
      assert(joint == sliced)
    }
  }

  test("partitionByKey co-locates equal keys") {
    val l = log((1, "insert", 1, "a"), (2, "update", 1, "b"), (3, "insert", 2, "c"))
    val parts = ChangeLog.partitionByKey(l, Seq("id"), Some(4))
      .withColumn("pid", spark_partition_id())
      .select("id", "pid").as[(Long, Int)].collect().groupBy(_._1)
    assert(parts.forall { case (_, ps) => ps.map(_._2).distinct.length == 1 })
  }

  test("compactDeltas fills from last non-null per column (oplog delta updates)") {
    val l = Seq(
      (1L, "insert", 1L, Some("a"), Some(10.0)),
      (2L, "update", 1L, None, Some(11.0)),       // price-only delta
      (3L, "update", 1L, Some("b"), None),        // status-only delta
      (4L, "insert", 2L, Some("x"), Some(5.0)),
      (5L, "delete", 2L, None, None))
      .toDF("seq", "op", "id", "status", "price")
    val got = ChangeLog.compactDeltas(l, Seq("id"), Seq("status", "price"))
      .select("id", "status", "price").as[(Long, String, Double)].collect().toSet
    assert(got == Set((1L, "b", 11.0)))
  }
}
