package graft.sinks

import graft.SparkSpec
import java.nio.file.{Files, Paths, Path => JPath}
import scala.jdk.CollectionConverters._

class SnapshotSinkSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-snap").toString + "/snap"

  private def log(rows: (Long, String, Long, String)*) =
    rows.toSeq.toDF("seq", "op", "id", "v")

  /** content fingerprint of every file under a dir, keyed by relative path */
  private def fingerprint(dir: JPath): Map[String, Int] =
    Files.walk(dir).iterator().asScala
      .filter(Files.isRegularFile(_))
      .map(f => dir.relativize(f).toString ->
        java.util.Arrays.hashCode(Files.readAllBytes(f)))
      .toMap

  test("merge applies LWW with tombstones; read hides bookkeeping") {
    val path = tmp()
    val sink = new SnapshotSink(spark, path, Seq("id"), numBuckets = 4)
    sink.merge(log((1, "insert", 1, "a"), (2, "insert", 2, "b")))
    sink.merge(log((3, "update", 1, "a2"), (4, "delete", 2, "b")))
    val got = sink.read().select("id", "v").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "a2"))
    assert(sink.read().columns.toSet == Set("id", "v"))
  }

  test("re-merging the same batch is idempotent (the foreachBatch-retry contract)") {
    // ann_stream_serve and the IVM entries rely on this: a retried
    // micro-batch re-merges identical (rows, seq) and must leave the
    // state byte-for-byte unchanged, so a post-merge probe re-reads
    // IDENTICAL state
    val path = tmp()
    val sink = new SnapshotSink(spark, path, Seq("id"), numBuckets = 4)
    sink.merge(log((1, "insert", 1, "a"), (1, "insert", 2, "b")))
    val b2 = log((2, "update", 1, "a2"), (2, "delete", 2, "b"),
      (2, "insert", 3, "c"))
    sink.merge(b2)
    val once = sink.read().select("id", "v").as[(Long, String)].collect().toMap
    sink.merge(b2) // the retry
    val twice = sink.read().select("id", "v").as[(Long, String)].collect().toMap
    assert(once == twice && once == Map(1L -> "a2", 3L -> "c"))
  }

  test("mergeOnce skips a replayed batch id even when the replay differs") {
    // seq-LWW covers identical-row replays; the batch-id guard covers the
    // harder case — a recomputed delta/retraction batch whose inputs read
    // state that already advanced would produce DIFFERENT rows on retry
    val path = tmp()
    val sink = new SnapshotSink(spark, path, Seq("id"), numBuckets = 4)
    assert(sink.mergeOnce(1L, log((1, "insert", 1, "a"))))
    assert(!sink.mergeOnce(1L, log((9, "update", 1, "POISON"))),
      "replayed id must be a no-op")
    assert(sink.read().select("id", "v").as[(Long, String)].collect().toMap ==
      Map(1L -> "a"))
    assert(sink.mergeOnce(2L, log((2, "update", 1, "b"))))
    assert(sink.read().select("id", "v").as[(Long, String)].collect().toMap ==
      Map(1L -> "b"))
  }

  test("late lower-seq change cannot resurrect a delete or roll back an image") {
    val path = tmp()
    val sink = new SnapshotSink(spark, path, Seq("id"), numBuckets = 4)
    sink.merge(log((5, "delete", 1, "x"), (6, "update", 2, "new")))
    sink.merge(log((1, "insert", 1, "zombie"), (2, "update", 2, "old")))
    val got = sink.read().select("id", "v").as[(Long, String)].collect().toMap
    assert(got == Map(2L -> "new"))
  }

  test("merge rewrites only touched buckets; untouched bucket files stay byte-identical") {
    val path = tmp()
    val n = 8
    val sink = new SnapshotSink(spark, path, Seq("id"), numBuckets = n)
    // seed enough keys that every bucket is populated
    sink.merge((1L to 200L).map(i => (i, "insert", i, s"v$i")).toDF("seq", "op", "id", "v"))
    // which bucket holds key 42?
    val touchedBucket = sink.readInternal()
      .filter($"id" === 42L).select("__bucket").as[Int].head()
    val before = fingerprint(Paths.get(path))
    sink.merge(log((1000, "update", 42, "updated")))
    val after = fingerprint(Paths.get(path))
    val untouchedBefore = before.filter(!_._1.startsWith(s"__bucket=$touchedBucket/"))
    val untouchedAfter = after.filter(!_._1.startsWith(s"__bucket=$touchedBucket/"))
    assert(untouchedBefore == untouchedAfter, "untouched bucket files changed")
    assert(before.keySet.filter(_.startsWith(s"__bucket=$touchedBucket/")) !=
      after.keySet.filter(_.startsWith(s"__bucket=$touchedBucket/")) ||
      before != after, "touched bucket was not rewritten")
    assert(sink.read().filter($"id" === 42L).select("v").as[String].head() == "updated")
  }

  test("a read after an interrupted swap self-heals (recover on read path)") {
    val path = tmp()
    val sink = new SnapshotSink(spark, path, Seq("id"), numBuckets = 4)
    sink.merge((1L to 50L).map(i => (i, "insert", i, s"v$i")).toDF("seq", "op", "id", "v"))
    val all = sink.read().count()
    // simulate a crash window: one live bucket moved to backup, staging left over
    val bucket = Files.list(Paths.get(path)).iterator().asScala
      .find(_.getFileName.toString.startsWith("__bucket=")).get
    val backup = Paths.get(path + ".backup")
    Files.createDirectories(backup)
    Files.move(bucket, backup.resolve(bucket.getFileName))
    Files.createDirectories(Paths.get(path + ".staging", "junk"))
    assert(!Files.exists(Paths.get(path, bucket.getFileName.toString))) // really gone
    // read() recovers before serving — no window where a consumer sees a
    // snapshot missing a bucket
    assert(sink.read().count() == all)
    assert(!Files.exists(backup))
    assert(!Files.exists(Paths.get(path + ".staging")))
  }

  test("a merge after an interrupted swap converges (replay idempotence)") {
    val path = tmp()
    val sink = new SnapshotSink(spark, path, Seq("id"), numBuckets = 4)
    val batch1 = (1L to 50L).map(i => (i, "insert", i, s"v$i")).toDF("seq", "op", "id", "v")
    sink.merge(batch1)
    val bucket = Files.list(Paths.get(path)).iterator().asScala
      .find(_.getFileName.toString.startsWith("__bucket=")).get
    val backup = Paths.get(path + ".backup")
    Files.createDirectories(backup)
    Files.move(bucket, backup.resolve(bucket.getFileName))
    // foreachBatch replays the same batch after the crash; merge() first
    // recovers, then re-applies — seq-LWW makes it converge
    sink.merge(batch1)
    val got = sink.read().select("id", "v").as[(Long, String)].collect().toMap
    assert(got == (1L to 50L).map(i => i -> s"v$i").toMap)
  }
}
