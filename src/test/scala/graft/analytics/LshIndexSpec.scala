package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Equality of the delta-maintained adaptive-LSH bucket index with the
  * from-scratch build it replaces (r13 verdict #1): after EVERY change
  * batch — inserts, updates, deletes, and cap drift in both directions —
  * the maintained `lshb` rows must equal lshAdaptiveBuckets over the
  * live set at that batch's cap, the maintained leaf counts must equal
  * the grouped counts of that assignment, and the point-read mates must
  * equal the from-scratch bkf ⋈ capped-mates pair set. The batch
  * schedule is chosen so the structural paths all fire: a split (dense
  * inserts), a merge (deletions), and cap-drift reshapes (cap up then
  * down on unchanged data).
  */
class LshIndexSpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-random unit-ish vectors; dim 16 keeps the spec
  // fast while exercising every sign plane
  private def vecsOf(ids: Seq[Long], salt: Long = 0L): DataFrame =
    ids.toDF("vec_id").select(col("vec_id"), expr(
      s"""transform(sequence(1, 16), k ->
         |  CAST(sin(CAST(pmod(xxhash64(vec_id * 131 + k * 17 + $salt), 10000)
         |    AS DOUBLE)) AS FLOAT))""".stripMargin).as("embedding"))

  private def expectedRows(live: DataFrame, cap: Long): Set[(Long, Int, Int, Long)] =
    ScaleOpsQueries.lshAdaptiveBuckets(live, cap)
      .select(col("vec_id"), col("tbl"), col("nbits"), col("bucket"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
      .toSet

  private def sinkRows(lshb: graft.sinks.SnapshotSink): Set[(Long, Int, Int, Long)] =
    lshb.read().select(col("vec_id"), col("tbl"), col("nbits"), col("bucket"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
      .toSet

  test("maintained bucket index equals the from-scratch adaptive build " +
      "across inserts/updates/deletes and cap drift (splits AND merges)") {
    val work = Q.scratch("lshidxspec")
    val lshb = new graft.sinks.SnapshotSink(spark, s"$work/lshb",
      Seq("tbl", "nbits", "bucket", "vec_id"), numBuckets = 8,
      bucketBy = Seq("tbl", "nbits", "bucket"))
    val cnt = new graft.sinks.SnapshotSink(spark, s"$work/lshcnt",
      Seq("tbl", "nbits", "bucket"))

    // batch 0: 150 vectors at cap 3 — dense roots split at init
    var liveIds = (0L until 150L).toSet
    var salts = liveIds.map(i => i -> 0L).toMap
    def liveVecs(): DataFrame = salts.toSeq.groupBy(_._2).map { case (salt, xs) =>
      vecsOf(xs.map(_._1).toSeq.sorted, salt)
    }.reduce(_ unionByName _)
    var leaves = LshIndex.initFromScratch(spark, lshb, cnt, liveVecs(), cap = 3L)
    assert(sinkRows(lshb) == expectedRows(liveVecs(), 3L), "init mismatch")
    assert(leaves.values.sum == 2L * liveIds.size, "init leaf counts")
    assert(leaves.keys.exists(_.nbits > 6), "init must have split at least one root")

    def runBatch(seqNo: Long, ins: Set[Long], upd: Set[Long], del: Set[Long],
        cap: Long, updSalt: Long, expectScan: Option[Boolean] = None): Unit = {
      val depIds = (upd ++ del).toSeq.sorted
      val departures = depIds.groupBy(i => salts(i)).map { case (salt, xs) =>
        vecsOf(xs, salt)
      }.reduceOption(_ unionByName _)
        .getOrElse(vecsOf(Nil))
      liveIds = liveIds ++ ins -- del
      salts = salts -- del ++ ins.map(_ -> 0L) ++ upd.map(_ -> updSalt)
      val arrivals = (ins ++ upd).toSeq.sorted.groupBy(i => salts(i))
        .map { case (salt, xs) => vecsOf(xs, salt) }
        .reduceOption(_ unionByName _).getOrElse(vecsOf(Nil))
      leaves = expectScan match {
        case None =>
          LshIndex.maintainBatch(spark, lshb, cnt, arrivals, departures,
            cap, seqNo)
        case Some(scan) =>
          // through the cost-based regime switch, asserting which path
          // it took (r14 verdict #1 done-criterion: a forced-regime-
          // switch batch in-spec)
          val res = LshIndex.applyBatch(spark, lshb, cnt, arrivals, departures,
            cap, seqNo,
            scan = LshIndex.scanRegime(
              (ins.size + upd.size).toLong + (upd.size + del.size).toLong,
              liveIds.size.toLong),
            liveVecs = liveVecs())
          assert(res.scanBkf.isDefined == scan,
            s"batch $seqNo regime: expected scan=$scan, " +
              s"got scan=${res.scanBkf.isDefined}")
          res.leaves
      }
      val exp = expectedRows(liveVecs(), cap)
      assert(sinkRows(lshb) == exp, s"batch $seqNo rows mismatch")
      val expCnt = exp.groupBy(t => (t._2, t._3, t._4)).view.mapValues(_.size.toLong).toMap
      val gotCnt = leaves.map { case (n, c) => (n.tbl, n.nbits, n.bucket) -> c }
      assert(gotCnt == expCnt, s"batch $seqNo leaf counts mismatch")
      val persisted = LshIndex.readLeaves(cnt)
        .map { case (n, c) => (n.tbl, n.nbits, n.bucket) -> c }
      assert(persisted == expCnt, s"batch $seqNo persisted counts mismatch")
    }

    // batch 1: dense insert burst into the same id-space + some updates
    // and deletes — must trigger at least one further split
    val preSplitLeaves = leaves.size
    runBatch(1L, ins = (1000L until 1120L).toSet, upd = (0L until 20L).toSet,
      del = (140L until 150L).toSet, cap = 3L, updSalt = 7L)
    assert(leaves.size > preSplitLeaves,
      "the insert burst must split at least one leaf")

    // batch 2: heavy deletions — subtree totals drop under cap, merges up
    val preMerge = leaves.keys.count(_.nbits > 6)
    runBatch(2L, ins = Set.empty, upd = Set.empty,
      del = (1000L until 1100L).toSet ++ (20L until 100L).toSet,
      cap = 3L, updSalt = 0L)
    assert(leaves.keys.count(_.nbits > 6) < preMerge,
      "deletions must merge at least one split region back up")

    // batch 3: NO data change, cap drifts UP — structure must merge to
    // exactly the from-scratch shape at the new cap
    val preDrift = leaves.size
    runBatch(3L, Set.empty, Set.empty, Set.empty, cap = 64L, updSalt = 0L)
    assert(leaves.size < preDrift, "cap-up drift must coarsen the structure")
    assert(leaves.keys.forall(_.nbits == 6), "cap 64 holds everything at roots")

    // batch 4: cap drifts back DOWN — splits re-fire without any change
    runBatch(4L, Set.empty, Set.empty, Set.empty, cap = 3L, updSalt = 0L)
    assert(leaves.keys.exists(_.nbits > 6), "cap-down drift must re-split")

    // batch 5: FORCED regime switch — a bulk insert over the scan
    // threshold (30 arrivals on 110 live ≈ 27%) must take the rebuild
    // path and land on the IDENTICAL from-scratch state
    runBatch(5L, ins = (2000L until 2030L).toSet, upd = Set.empty,
      del = Set.empty, cap = 3L, updSalt = 0L, expectScan = Some(true))

    // batch 6: a small update right after a scan batch must take the
    // delta path against the rebuilt state (the regimes interleave)
    runBatch(6L, ins = Set.empty, upd = Set(0L), del = Set.empty,
      cap = 3L, updSalt = 11L, expectScan = Some(false))

    // the point-read mates equal the from-scratch pair set for a touched
    // subset (the serving read the build loop actually performs)
    val touchedIds = liveIds.toSeq.sorted.take(25)
    val touched = touchedIds.groupBy(salts).map { case (salt, xs) =>
      vecsOf(xs.sorted, salt)
    }.reduce(_ unionByName _)
    val got = LshIndex.matesFor(spark, lshb, leaves, touched, cap = 3L, "spec")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bkf = ScaleOpsQueries.lshAdaptiveBuckets(liveVecs(), 3L).localCheckpoint()
    val bkCap = ScaleOpsQueries.lshMatesCapped(bkf, 3L, "spec")
    val tdf = touchedIds.toDF("vec_id")
    val exp = bkf.join(tdf, Seq("vec_id")).as("a")
      .join(bkCap.as("b"),
        col("a.tbl") === col("b.tbl") && col("a.nbits") === col("b.nbits") &&
          col("a.bucket") === col("b.bucket") && col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("u"), col("b.vec_id").as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == exp, "matesFor must equal the from-scratch pair set")
  }

  // Randomized-sequence property (r14 verdict #5): the driver-side trie
  // `solve` is the index's subtlest logic and the directed schedule above
  // cannot cover its interleavings. A seeded random walk of mixed
  // insert/update/delete batches with cap drift asserts, after EVERY
  // batch: maintained rows ≡ from-scratch at that cap, leaf counts ≡ the
  // grouped counts of that assignment (returned AND persisted), and the
  // point-read mates ≡ the from-scratch pair set for a random touched
  // sample. The seed is in every failure message (override via
  // GRAFT_LSH_SEED to replay a failing sequence); id/vector selections
  // inside a batch are Random-walk independent, and the vectors
  // themselves are xxhash64-derived (the r13 linear-combo lesson).
  test("randomized batch sequences keep maintained ≡ from-scratch " +
      "(rows, leaf counts, mates) under cap drift") {
    val seed = sys.env.get("GRAFT_LSH_SEED").map(_.toLong).getOrElse(20260816L)
    val rnd = new scala.util.Random(seed)
    def clue(s: String) = s"seed=$seed: $s"
    val work = Q.scratch("lshidxrand")
    val lshb = new graft.sinks.SnapshotSink(spark, s"$work/lshb",
      Seq("tbl", "nbits", "bucket", "vec_id"), numBuckets = 8,
      bucketBy = Seq("tbl", "nbits", "bucket"))
    val cnt = new graft.sinks.SnapshotSink(spark, s"$work/lshcnt",
      Seq("tbl", "nbits", "bucket"))

    var liveIds = (0L until 240L).toSet
    var salts: Map[Long, Long] = liveIds.map(_ -> 0L).toMap
    var nextId = 10000L
    def liveVecs(): DataFrame = salts.toSeq.groupBy(_._2).map { case (salt, xs) =>
      vecsOf(xs.map(_._1).sorted, salt)
    }.reduce(_ unionByName _)
    def framesOf(m: Map[Long, Long]): DataFrame =
      m.toSeq.groupBy(_._2).map { case (salt, xs) => vecsOf(xs.map(_._1).sorted, salt) }
        .reduceOption(_ unionByName _).getOrElse(vecsOf(Nil))

    var cap = 3L
    var leaves = LshIndex.initFromScratch(spark, lshb, cnt, liveVecs(), cap)
    assert(sinkRows(lshb) == expectedRows(liveVecs(), cap), clue("init mismatch"))
    var sawScan = false
    var sawDelta = false

    (1 to 10).foreach { b =>
      // batch composition: disjoint upd/del subsets of live, fresh ins.
      // Alternate a SMALL bias (≤ 2 of each kind — under the scan
      // threshold at these live sizes) with a BULK bias (up to live/4
      // updates/deletes + up to 80 inserts — over it), so any seed's
      // walk interleaves both regimes against each other's state; the
      // within-mode composition stays random.
      val liveSorted = liveIds.toSeq.sorted
      val shuffled = rnd.shuffle(liveSorted)
      val small = b % 2 == 0
      val nUpd = if (small) rnd.nextInt(3) else rnd.nextInt(1 + liveSorted.size / 4)
      val nDel = if (small) rnd.nextInt(3)
        else rnd.nextInt(1 + math.min(liveSorted.size - nUpd, liveSorted.size / 4))
      val upd = shuffled.take(nUpd).toSet
      val del = shuffled.slice(nUpd, nUpd + nDel).toSet
      val nIns = if (small) rnd.nextInt(3) else rnd.nextInt(80)
      val ins = (nextId until nextId + nIns).toSet
      nextId += nIns
      cap = Seq(3L, 4L, 6L, 64L)(rnd.nextInt(4)) // drift both directions
      val departures = framesOf(salts.view.filterKeys(k => upd(k) || del(k)).toMap)
      liveIds = liveIds ++ ins -- del
      salts = salts -- del ++ (ins ++ upd).map(_ -> b.toLong)
      val arrivals = framesOf(salts.view.filterKeys(k => ins(k) || upd(k)).toMap)
      // through the real regime switch: random batch sizes exercise BOTH
      // paths against each other's state (tracked and asserted below)
      val res = LshIndex.applyBatch(spark, lshb, cnt, arrivals, departures,
        cap, b.toLong,
        scan = LshIndex.scanRegime(
          (ins.size + upd.size).toLong + (upd.size + del.size).toLong,
          liveIds.size.toLong),
        liveVecs = liveVecs())
      leaves = res.leaves
      if (res.scanBkf.isDefined) sawScan = true else sawDelta = true
      val exp = expectedRows(liveVecs(), cap)
      assert(sinkRows(lshb) == exp,
        clue(s"batch $b rows mismatch (cap=$cap ins=${ins.size} " +
          s"upd=${upd.size} del=${del.size})"))
      val expCnt = exp.groupBy(t => (t._2, t._3, t._4)).view.mapValues(_.size.toLong).toMap
      assert(leaves.map { case (n, c) => (n.tbl, n.nbits, n.bucket) -> c } == expCnt,
        clue(s"batch $b returned leaf counts mismatch"))
      assert(LshIndex.readLeaves(cnt)
          .map { case (n, c) => (n.tbl, n.nbits, n.bucket) -> c } == expCnt,
        clue(s"batch $b persisted leaf counts mismatch"))
      // mates for a random touched sample vs the from-scratch pair set
      val sample = rnd.shuffle(liveIds.toSeq.sorted).take(15)
      val touched = framesOf(salts.view.filterKeys(sample.contains).toMap)
      val got = LshIndex.matesFor(spark, lshb, leaves, touched, cap, "randspec")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val bkf = ScaleOpsQueries.lshAdaptiveBuckets(liveVecs(), cap).localCheckpoint()
      val bkCap = ScaleOpsQueries.lshMatesCapped(bkf, cap, "randspec")
      val sdf = sample.toDF("vec_id")
      val expM = bkf.join(sdf, Seq("vec_id")).as("a")
        .join(bkCap.as("b"),
          col("a.tbl") === col("b.tbl") && col("a.nbits") === col("b.nbits") &&
            col("a.bucket") === col("b.bucket") && col("a.vec_id") =!= col("b.vec_id"))
        .select(col("a.vec_id").as("u"), col("b.vec_id").as("v"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expM, clue(s"batch $b matesFor pair-set mismatch"))
      // the scan regime's direct-from-bkf mates must equal the same set
      res.scanBkf.foreach { sb =>
        val gotB = LshIndex.matesFromBkf(sb, leaves, sdf, cap, "randspec-bkf")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(gotB == expM, clue(s"batch $b matesFromBkf pair-set mismatch"))
      }
    }
    assert(sawScan && sawDelta,
      clue(s"the random walk must exercise both regimes " +
        s"(scan=$sawScan delta=$sawDelta) — re-tune batch sizes"))
  }
}
