package graft.analytics

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.functions._

/** The scale CLAIMS of ScaleOpsQueries, asserted on real plans/data —
  * correctness is already oracle-gated; this suite pins the physical
  * properties that make each operator survive 100 TB.
  */
class ScaleOpsSpec extends SparkSpec {

  /** Walk the AQE-final plan INCLUDING query-stage subtrees and subqueries.
    * QueryStageExec is leaf-like (its subtree hangs off a field, not
    * `children`), so a naive plan.collect silently misses every exchange
    * AQE has already wrapped — reuse ExplainAudit's stage-crossing walk.
    */
  private def collectAll[T](p: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Seq[T] = {
    val here = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    graft.tools.ExplainAudit.collectPhysical(here)(pf) ++
      here.subqueries.flatMap(collectAll(_)(pf))
  }

  test("bucketed co-located join + agg runs with ZERO shuffle exchanges") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val df = ScaleOpsQueries.bucketedJoinAgg(spark, sf0001)
      df.collect() // execute so AQE finalizes
      val shuffles = collectAll(df.queryExecution.executedPlan) {
        case s: ShuffleExchangeExec => s
      }
      assert(shuffles.isEmpty,
        s"bucketed join/agg must be exchange-free, found: $shuffles")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  test("bloom routes only the maybe-dup fraction into the verify join") {
    val docs = Tables.documents(spark, sf0001)
    val existing = docs.filter(col("doc_id") % 3 =!= 0)
    val batch = docs.filter(col("doc_id") % 3 === 0)
    val bits = ScaleOpsQueries.bloomBits(spark, existing)
    val nBatch = batch.count()
    val nCand = batch.filter(ScaleOpsQueries.mightContain(bits, col("text"))).count()
    // no natural dups in the raw corpus: every candidate here is a false
    // positive, so the candidate fraction IS the bloom's fp rate — the
    // fraction of a new batch that would pay the corpus join at 100 TB
    assert(nCand < nBatch / 10,
      s"bloom should route <10% of the batch to the join, got $nCand/$nBatch")
    // and zero false negatives by construction: every true dup is routed
    val planted = batch.limit(50).select(col("text"))
    val missed = planted.join(existing.select(col("text")), Seq("text"), "left_semi")
      .filter(!ScaleOpsQueries.mightContain(bits, col("text"))).count()
    assert(missed == 0, "bloom false negative — impossible by construction")
  }

  test("partitioned layout prunes the scan to the queried dates") {
    val ev = Tables.events(spark, sf0001).withColumn("event_date", to_date(col("ts")))
    val dir = java.nio.file.Files.createTempDirectory("scaleops-prune").toString + "/ev"
    ev.write.mode("overwrite").partitionBy("event_date").parquet(dir)
    val nDates = ev.select(col("event_date")).distinct().count()
    val d0 = ev.agg(min(col("event_date"))).head.getDate(0)
    val hi = java.sql.Date.valueOf(d0.toLocalDate.plusDays(2))
    val pruned = spark.read.parquet(dir)
      .filter(col("event_date").between(lit(d0), lit(hi)))
    pruned.collect()
    val scans = collectAll(pruned.queryExecution.executedPlan) {
      case f: FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    val scan = scans.head
    assert(scan.partitionFilters.nonEmpty, "scan must carry partition filters")
    val selected = scan.relation.location.listFiles(
      scan.partitionFilters, scan.dataFilters).length
    assert(selected == 3 && selected < nDates,
      s"expected 3 of $nDates date partitions selected, got $selected")
  }

  test("z-order clusters a 2-D box into few coarse buckets") {
    val df = Catalog.queries("opt_zorder_layout")(spark, sf0001)
    // a 256x256 box in key space: under z-order its rows share the high
    // interleaved bits, so the box touches a tiny fraction of the coarse
    // zbuckets — the min/max file-skipping lever for two-column predicates
    // bucket at 2^12 granularity (finer than the query's coarse zbucket,
    // so the property is visible even at sf0.001's small key ranges)
    val bucketed = df.withColumn("zb12", expr("zval >> 12"))
    val box = bucketed.filter(col("l_orderkey") < 256 && col("l_partkey") < 256)
    val totalBuckets = bucketed.select(col("zb12")).distinct().count()
    val boxBuckets = box.select(col("zb12")).distinct().count()
    assert(boxBuckets <= 16,
      s"a 256x256 box spans z < 2^16 = at most 16 buckets of 2^12; got $boxBuckets")
    assert(totalBuckets > 2 * boxBuckets,
      s"box buckets ($boxBuckets) should be a small fraction of $totalBuckets")
  }

  test("k-means refinement moves centroids and keeps every vector assigned") {
    val out = Catalog.queries("sim_ivf_kmeans_refined")(spark, sf0001)
    val rows = out.collect()
    val nVec = Tables.embeddings(spark, sf0001).count()
    val dims = rows.map(_.getLong(1)).distinct
    assert(dims.length == 64, s"expected 64 dims, got ${dims.length}")
    // membership conserved: each dim row of a cell carries that cell's
    // member count, so the per-dim sum over cells is the corpus size
    val perDim = rows.groupBy(_.getLong(1)).map { case (_, rs) =>
      rs.map(_.getLong(3)).sum
    }.toSet
    assert(perDim == Set(nVec), s"membership not conserved: $perDim vs $nVec")
    // refinement must actually move at least one centroid off its seed
    val seeds = Tables.embeddings(spark, sf0001).filter(col("vec_id") < 16)
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 64.0 + 0.5) AS BIGINT))")
          .as("q"))
      .select(col("vec_id"), posexplode(col("q")).as(Seq("dim", "v")))
      .select(col("vec_id").as("cell"), col("dim").cast("long").as("dim"),
        (col("v") * 256).as("seed_q"))
    val moved = out.join(seeds, Seq("cell", "dim"))
      .filter(col("centroid_q") =!= col("seed_q")).count()
    assert(moved > 0, "two Lloyd iterations left every centroid exactly on its seed")
  }

  test("clustered layout compresses smaller than the arrival layout") {
    val ev = Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_type"), col("ts"), col("value"))
    def bytesOf(dir: String): Long =
      new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
        .map(_.length()).sum
    val base = java.nio.file.Files.createTempDirectory("scaleops-compress").toString
    ev.repartition(4).write.mode("overwrite").parquet(s"$base/unsorted")
    ev.repartitionByRange(4, col("event_type"), col("user_id"))
      .sortWithinPartitions(col("event_type"), col("user_id"), col("ts"))
      .write.mode("overwrite").parquet(s"$base/sorted")
    val (u, s) = (bytesOf(s"$base/unsorted"), bytesOf(s"$base/sorted"))
    assert(s < u, s"clustered layout ($s B) should beat unsorted ($u B)")
  }

  test("freqItems shortlist is bounded and contains every true heavy hitter") {
    val mixed = Tables.lineitem(spark, sf0001).select(
      when(col("l_orderkey") % 7 < 2, lit(42L)).otherwise(col("l_partkey")).as("k"))
    val cands = mixed.stat.freqItems(Seq("k"), 0.005).head.getSeq[Long](0)
    assert(cands.size <= 200, s"candidate list must be <= 1/support, got ${cands.size}")
    val n = mixed.count()
    val trueHH = mixed.groupBy(col("k")).count()
      .filter(col("count") >= math.ceil(0.01 * n))
      .collect().map(_.getLong(0)).toSet
    assert(trueHH.subsetOf(cands.toSet),
      s"sketch missed true heavy hitters: ${trueHH -- cands.toSet}")
  }

  test("min/max stats skip almost every z-bucket for the box predicate") {
    val stats = Catalog.queries("opt_minmax_skipping_stats")(spark, sf0001).collect()
    val needed = stats.count(_.getAs[Boolean]("scan_for_box_256"))
    assert(needed * 4 <= stats.length,
      s"box should scan <=25% of buckets, needs $needed of ${stats.length}")
    // skip decisions must be sound: every bucket holding a box row is scanned
    val zb = Tables.lineitem(spark, sf0001)
      .filter(col("l_orderkey") < 256 && col("l_partkey") < 256)
      .selectExpr(
        """aggregate(sequence(0, 15), CAST(0 AS BIGINT),
          | (acc, i) -> acc + shiftleft(CAST(((l_orderkey >> i) & 1) AS BIGINT), 2 * i)
          |   + shiftleft(CAST(((l_partkey >> i) & 1) AS BIGINT), 2 * i + 1)) >> 12""".stripMargin
          + " AS zb")
      .distinct().collect().map(_.getLong(0)).toSet
    val scanned = stats.filter(_.getAs[Boolean]("scan_for_box_256"))
      .map(_.getAs[Long]("zbucket")).toSet
    assert(zb.subsetOf(scanned), s"unsound skip: box buckets ${zb -- scanned} skipped")
  }

  test("native zorder2 is bit-identical to the SQL HOF formulation") {
    val li = Tables.lineitem(spark, sf0001).limit(2000)
    val both = li.select(
      graft.functions.GraftFunctions.zorder2(col("l_orderkey"), col("l_partkey")).as("native"),
      expr(
        """aggregate(sequence(0, 15), CAST(0 AS BIGINT),
          | (acc, i) -> acc + shiftleft(CAST(((l_orderkey >> i) & 1) AS BIGINT), 2 * i)
          |   + shiftleft(CAST(((l_partkey >> i) & 1) AS BIGINT), 2 * i + 1))""".stripMargin)
        .as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
    // and via the SQL front door
    graft.functions.GraftFunctions.register(spark)
    assert(spark.sql("SELECT zorder2(5L, 3L) AS z").head.getLong(0) ==
      (1L | 16L | 2L | 8L)) // x=101 -> z bits 0,4; y=011 -> z bits 1,3 = 27
  }

  test("dim-filtered join over partitioned fact uses dynamic partition pruning") {
    val ev = Tables.events(spark, sf0001).withColumn("event_date", to_date(col("ts")))
    val dir = java.nio.file.Files.createTempDirectory("scaleops-dpp").toString + "/ev"
    ev.write.mode("overwrite").partitionBy("event_date").parquet(dir)
    val dim = ev.select(col("event_date")).distinct()
      .withColumn("is_weekend", dayofweek(col("event_date")).isin(1, 7))
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio", "100.0")
    try {
      val q = spark.read.parquet(dir)
        .join(dim.filter(col("is_weekend")), Seq("event_date"))
        .groupBy(col("event_date")).agg(count(lit(1)).as("n"))
      assert(q.queryExecution.executedPlan.toString.contains("dynamicpruning"),
        "fact scan should carry a dynamic-pruning subquery filter")
      q.collect()
    } finally {
      spark.conf.unset("spark.sql.optimizer.dynamicPartitionPruning.useStats")
      spark.conf.unset("spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio")
    }
  }

  test("selective dim join injects a runtime bloom filter into the fact scan") {
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "1GB")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val q = ScaleOpsQueries.runtimeBloomJoin(spark, sf0001)
      q.collect()
      assert(q.queryExecution.optimizedPlan.toString.contains("might_contain"),
        "probe side should be pre-filtered by the runtime bloom filter")
    } finally {
      spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.enabled")
      spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold")
      spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  test("compaction collapses the landing zone's file count losslessly") {
    // drives the SHIPPED pipeline (same code path as the catalog entry),
    // not a private re-implementation of it
    val base = ScaleOpsQueries.compactionRun(spark, sf0001)
    def files(dir: String) = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(files(s"$base/landing") >= 32, "landing zone should be fragmented")
    assert(files(s"$base/compacted") <= 2, "compaction should hit the target count")
    assert(spark.read.parquet(s"$base/compacted").count() ==
      Tables.events(spark, sf0001).count())
  }

  test("streaming watermark gate actually drops late rows") {
    val out = Catalog.queries("evt_stream_watermark_late_drop")(spark, sf0001)
    val emitted = out.agg(sum(col("n"))).head.getLong(0)
    val ev = Tables.events(spark, sf0001)
    // total events falling in the emitted windows — what a batch engine
    // (or a stream with no watermark discipline) would have counted
    val windows = out.select(col("window_start"))
    val inWindows = ev.select(date_trunc("hour", col("ts")).as("window_start"))
      .join(windows, Seq("window_start"), "left_semi").count()
    assert(emitted < inWindows,
      s"no late rows were dropped: emitted $emitted of $inWindows")
    assert(emitted > inWindows / 2, "late drop should be the exception, not the rule")
  }

  // The evt_stream_watermark_late_drop ORACLE hard-codes the two-phase
  // watermark contract: the LATE FILTER for batch N uses the watermark
  // that was in effect DURING batch N-1 (i.e. computed from data through
  // batch N-2), while EVICTION/emission for batch N uses the watermark
  // from data through N-1 — and a late row is judged by its WINDOW END,
  // not its row time. If a Spark upgrade shifts that runtime contract,
  // this probe fails with a named assertion instead of the catalog entry
  // failing with an opaque oracle hash mismatch. Mirroring the entry's
  // 3-batch shape (delay 30 min):
  //   batch a: 10:59, 12:00  -> wm(a) = 11:30
  //   batch b: 15:00         -> wm(b) = 14:30; eviction here uses wm(a),
  //                             emitting [10:00,11:00) with n=1
  //   batch c: 10:05 (window end 11:00 <= filter-wm 11:30 -> DROPPED)
  //            12:05 (window end 13:00 >  filter-wm 11:30 -> MERGES into
  //                   the still-open [12:00,13:00) alongside 12:00);
  //            eviction uses wm(b)=14:30 -> [12:00,13:00) emits n=2
  //   [15:00,16:00) never closes (wm stays 14:30) and is not emitted
  test("watermark two-phase contract probe: late row merges iff its window is still open") {
    import java.nio.file.{Files, Paths}
    import java.nio.file.attribute.FileTime
    import org.apache.spark.sql.streaming.Trigger
    val work = Files.createTempDirectory("graft-wm-probe").toString
    val mkTs = (s: String) => java.sql.Timestamp.valueOf(s)
    def writeOne(name: String, modMs: Long, ts: String*): Unit = {
      val stage = s"$work/stage_$name"
      val rows = ts.map(t => Tuple1(mkTs(t)))
      import spark.implicits._
      rows.toDF("ts").coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).head
      val dest = Paths.get(s"$work/in/$name.parquet")
      Files.createDirectories(dest.getParent)
      Files.move(part.toPath, dest)
      Files.setLastModifiedTime(dest, FileTime.fromMillis(modMs))
    }
    writeOne("a", 1000000L, "2025-01-01 10:59:00", "2025-01-01 12:00:00")
    writeOne("b", 2000000L, "2025-01-01 15:00:00")
    writeOne("c", 3000000L, "2025-01-01 10:05:00", "2025-01-01 12:05:00")
    val src = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("ts",
          org.apache.spark.sql.types.TimestampType))))
      .option("maxFilesPerTrigger", 1).parquet(s"$work/in")
    val agg = src.withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("n"))
    val q = agg.writeStream.format("parquet")
      .option("path", s"$work/out")
      .option("checkpointLocation", s"$work/ckpt")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    withStream(q)(q.awaitTermination())
    val got = spark.read.parquet(s"$work/out")
      .collect().map(r => r.getTimestamp(0).toString -> r.getLong(1)).toMap
    assert(got == Map(
      "2025-01-01 10:00:00.0" -> 1L, // late 10:05 DROPPED (end <= filter-wm)
      "2025-01-01 12:00:00.0" -> 2L), // late 12:05 MERGED (window still open)
      s"two-phase watermark contract shifted; emitted windows: $got")
  }

  test("pq/adc: reported top-5 equals a driver-side asymmetric-distance scan") {
    val vecs = Tables.embeddings(spark, sf0001).select("vec_id", "embedding")
      .collect()
      .map(x => (x.getLong(0), x.getSeq[Float](1).map(_.toDouble).toVector))
    // lattice centroid of a sign code: ±0.25 per dim
    val cent = vecs.map { case (id, v) =>
      id -> v.map(x => if (x > 0) 0.25 else -0.25)
    }.toMap
    val got = Catalog.queries("sim_pq_adc_topk")(spark, sf0001).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getDouble(3)))
      .groupBy(_._1)
    val queries = vecs.filter(_._1 % 50 == 0)
    assert(got.keySet == queries.map(_._1).toSet)
    queries.foreach { case (qid, qv) =>
      val exp = vecs.filter(_._1 != qid).map { case (nid, _) =>
        val c = cent(nid)
        var d = 0.0
        var k = 0
        while (k < 64) { val t = qv(k) - c(k); d += t * t; k += 1 }
        (d, nid)
      }.sortBy(identity).take(5)
      val rows = got(qid).sortBy(_._2)
      assert(rows.map(_._2).toSeq == (1L to 5L).toSeq)
      rows.zip(exp).foreach { case ((_, _, nid, dist), (ed, eid)) =>
        assert(nid == eid, s"query $qid: neighbor $nid != expected $eid")
        assert(math.abs(dist - ed) < 1e-3, s"query $qid: adc $dist vs $ed")
      }
    }
  }

  test("incremental ANN under CDC equals a full driver-side batch rebuild") {
    val sf = sf0001
    val got = Catalog.queries("ann_cdc_incremental_index")(spark, sf)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // independent reimplementation: replay the change rules over plain
    // Scala collections, LWW by seq, quantize, assign vs frozen seeds
    val base = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toVector)
    def q64(e: Vector[Float]): Vector[Long] =
      e.map(x => math.floor(x.toDouble * 64.0 + 0.5).toLong)
    def rot(e: Vector[Float], b: Int): Vector[Float] = e.drop(b) ++ e.take(b)
    val state = scala.collection.mutable.Map.empty[Long, Vector[Float]]
    base.foreach { case (id, e) => state(id) = e }
    (1 to 3).foreach { b =>
      base.foreach { case (id, e) =>
        if (id % 10 == b) state(id) = rot(e, b)
        else if (id % 17 == b) state.remove(id)
        if (id % 23 == b) state(id + 1000000L * b) = rot(e, b + 3)
      }
    }
    val seeds = base.filter(_._1 < 16).map { case (c, e) => (c, q64(e)) }
    def assign(q: Vector[Long]): Long = seeds.map { case (c, cv) =>
      (q.zip(cv).map { case (a, bb) => (a - bb) * (a - bb) }.sum, c)
    }.min._2
    val exp = state.map { case (id, e) =>
      val q = q64(e)
      id -> ((assign(q), q.zipWithIndex.map { case (v, i) => (i + 1) * v }.sum))
    }.toMap
    assert(got == exp, "maintained index must equal the batch rebuild")
    // CDC semantics actually exercised: deletions absent, inserts
    // present, at least one update changed its checksum vs the base
    assert(base.exists { case (id, _) =>
      id % 17 == 1 && id % 10 != 1 && !got.contains(id) })
    assert(got.keys.exists(_ > 1000000L), "inserted keys must be present")
    val updated = base.find { case (id, _) => id % 10 == 1 && id % 17 != 2 && id % 17 != 3 }.get
    val baseChk = q64(updated._2).zipWithIndex.map { case (v, i) => (i + 1) * v }.sum
    assert(got(updated._1)._2 != baseChk, "an update must change the stored image")
  }

  test("incremental ANN probe serves from the maintained state (live rows only)") {
    val rows = Catalog.queries("ann_cdc_incremental_probe")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val idx = Catalog.queries("ann_cdc_incremental_index")(spark, sf0001)
      .collect().map(_.getLong(0)).toSet
    rows.foreach { r =>
      assert(idx.contains(r.getLong(0)), "query must be a live index row")
      assert(idx.contains(r.getLong(2)), "neighbor must be a live index row")
      assert(r.getLong(1) >= 1 && r.getLong(1) <= 3)
    }
  }

  /** Driver-side residual-IVF-PQ rebuild (plain Scala collections):
    * replay the CDC rules → LWW final state, train codebooks on the BASE
    * corpus (init codes = vectors 16..31, one assignment step, floorDiv
    * rounded means on the ×16384 lattice), encode the final state.
    * Returns (final state, seed map, codebook, per-vector (cell, codes)).
    */
  private def pqRebuild(sf: String): (
      Map[Long, Vector[Float]], Map[Long, Vector[Long]],
      Map[(Int, Long), Vector[Long]], Map[Long, (Long, Vector[Long])]) = {
    val base = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toVector)
    def q64(e: Vector[Float]): Vector[Long] =
      e.map(x => math.floor(x.toDouble * 64.0 + 0.5).toLong)
    def rot(e: Vector[Float], b: Int): Vector[Float] = e.drop(b) ++ e.take(b)
    val state = scala.collection.mutable.Map.empty[Long, Vector[Float]]
    base.foreach { case (id, e) => state(id) = e }
    (1 to 3).foreach { b =>
      base.foreach { case (id, e) =>
        if (id % 10 == b) state(id) = rot(e, b)
        else if (id % 17 == b) state.remove(id)
        if (id % 23 == b) state(id + 1000000L * b) = rot(e, b + 3)
      }
    }
    val seedMap = base.filter(_._1 < 16)
      .map { case (c, e) => c -> q64(e) }.toMap
    def assign(q: Vector[Long]): Long = seedMap.toSeq.map { case (c, cv) =>
      (q.zip(cv).map { case (a, bb) => (a - bb) * (a - bb) }.sum, c)
    }.min._2
    def residual(q: Vector[Long]): (Long, Vector[Long]) = {
      val c = assign(q)
      (c, q.zip(seedMap(c)).map { case (a, bb) => a - bb })
    }
    // train on BASE residuals: init codes = ids 16..31
    val baseRes = base.map { case (id, e) => id -> residual(q64(e))._2 }
    val init = baseRes.filter { case (id, _) => id >= 16 && id < 32 }
      .flatMap { case (id, r) =>
        (0 until 8).map(m => (m, id - 16) -> r.slice(m * 8, m * 8 + 8)) }
      .toMap
    def argminCode(rs: Vector[Long], cands: Map[(Int, Long), Vector[Long]],
        m: Int, refine: Boolean): Long =
      // .toSeq first: collect on a Map producing (d, code) pairs would
      // re-key BY DISTANCE and silently drop tied candidates, breaking
      // the (dist, code) tie-break
      cands.toSeq.collect { case ((mm, code), cv) if mm == m =>
        val d = rs.zip(cv).map { case (a, bb) =>
          val x = if (refine) 256 * a - bb else a - bb; x * x }.sum
        (d, code)
      }.min._2
    val assigned = baseRes.flatMap { case (id, r) =>
      (0 until 8).map { m =>
        val rs = r.slice(m * 8, m * 8 + 8)
        (m, argminCode(rs, init, m, refine = false), rs)
      } }
    val cb = assigned.groupBy(t => (t._1, t._2)).map { case ((m, code), g) =>
      val n = g.length.toLong
      (m, code) -> (0 until 8).map { i =>
        Math.floorDiv(256L * g.map(_._3(i)).sum, n) }.toVector
    }
    val codes = state.map { case (id, e) =>
      val (c, r) = residual(q64(e))
      id -> ((c, (0 until 8).map { m =>
        argminCode(r.slice(m * 8, m * 8 + 8), cb, m, refine = true) }.toVector))
    }.toMap
    (state.toMap, seedMap, cb, codes)
  }

  test("maintained residual-PQ code table equals the full driver-side rebuild") {
    val got = Catalog.queries("ann_cdc_pq_codes")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val (_, seedMap, _, codes) = pqRebuild(sf0001)
    val exp = codes.map { case (id, (c, cs)) =>
      id -> ((c, cs.zipWithIndex.map { case (cd, m) => cd << (4 * m) }.sum))
    }
    assert(got == exp, "maintained PQ codes must equal the batch rebuild")
    // the code space is actually used: >1 distinct word, inserts present,
    // and the cells span more than one coarse centroid
    assert(got.values.map(_._2).toSet.size > 1)
    assert(got.keys.exists(_ > 1000000L))
    assert(got.values.map(_._1).toSet.size > 1)
    assert(seedMap.size == 16)
  }

  test("PQ codebook drift tripwire: in-regime batches pass, a drifted batch trips") {
    // the entry's gated recon_err column is populated and inside the
    // declared operating bound for every live vector
    val errs = Catalog.queries("ann_cdc_pq_codes")(spark, sf0001)
      .select(col("recon_err")).collect().map(_.getLong(0))
    assert(errs.nonEmpty &&
      errs.forall(e => e >= 0 && e <= ScaleOpsQueries.PqDriftBound))
    // plant a drifted batch: embeddings scaled ×8 sit far outside the
    // trained residual regime (measured ~1.5e10 vs the 1e9 bound); the
    // per-batch gate must fail LOUDLY with the retrain lever, not encode
    // silently-degraded codes
    val (_, cbOne) = ScaleOpsQueries.annResidualCodebooks(spark, sf0001)
    val drifted = graft.core.Tables.embeddings(spark, sf0001)
      .select(col("vec_id"),
        expr("transform(embedding, x -> x * CAST(8.0 AS FLOAT))").as("embedding"))
    val e = intercept[Exception] {
      ScaleOpsQueries.pqDriftGuarded(
        ScaleOpsQueries.annPqEncodeAgainstBase(spark, sf0001, drifted, cbOne))
        .collect()
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else Option(t.getMessage).getOrElse("") + msgs(t.getCause)
    assert(msgs(e).contains("operating bound") && msgs(e).contains("retrain"))
  }

  test("maintained residual-PQ ADC probe equals the driver-side rebuild") {
    val got = Catalog.queries("ann_cdc_pq_probe")(spark, sf0001)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    val (state, seedMap, cb, codes) = pqRebuild(sf0001)
    def q64(e: Vector[Float]): Vector[Long] =
      e.map(x => math.floor(x.toDouble * 64.0 + 0.5).toLong)
    val exp = state.keys.filter(_ % 50 == 0).flatMap { qid =>
      val qq = q64(state(qid))
      val probed = seedMap.toSeq.map { case (c, cv) =>
        (qq.zip(cv).map { case (a, b) => (a - b) * (a - b) }.sum, c)
      }.sorted.take(2)
      val cand = probed.flatMap { case (_, cell) =>
        val qr = qq.zip(seedMap(cell)).map { case (a, b) => a - b }
        // .toSeq first — a Map.collect of (adc, vid) pairs would re-key
        // by adc and drop tied candidates
        codes.toSeq.collect { case (vid, (c, cs)) if c == cell && vid != qid =>
          val adc = (0 until 8).map { m =>
            val rs = qr.slice(m * 8, m * 8 + 8)
            rs.zip(cb((m, cs(m)))).map { case (a, b) =>
              (256 * a - b) * (256 * a - b) }.sum
          }.sum
          (adc, vid)
        }
      }.sorted.take(3)
      cand.zipWithIndex.map { case ((adc, vid), i) =>
        (qid, i + 1L) -> ((vid, adc)) }
    }.toMap
    assert(got == exp, "ADC probe must equal the driver-side rebuild")
    assert(got.nonEmpty)
  }

  test("streaming ANN serving equals per-batch driver rebuilds; mid-stream merges change answers") {
    val sf = sf0001
    val got = Catalog.queries("ann_stream_serve")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
        ((r.getLong(3), r.getLong(4)))).toMap
    val base = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toVector)
    def q64(e: Vector[Float]): Vector[Long] =
      e.map(x => math.floor(x.toDouble * 64.0 + 0.5).toLong)
    def rot(e: Vector[Float], b: Int): Vector[Float] = e.drop(b) ++ e.take(b)
    val seedMap = base.filter(_._1 < 16).map { case (c, e) => c -> q64(e) }.toMap
    def dist(a: Vector[Long], b: Vector[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def stateAt(qb: Int): Map[Long, Vector[Float]] = {
      val st = scala.collection.mutable.Map.empty[Long, Vector[Float]]
      base.foreach { case (id, e) => st(id) = e }
      (1 to qb).foreach { b => base.foreach { case (id, e) =>
        if (id % 10 == b) st(id) = rot(e, b)
        else if (id % 17 == b) st.remove(id)
        if (id % 23 == b) st(id + 1000000L * b) = rot(e, b + 3)
      } }
      st.toMap
    }
    val queries = base.filter(_._1 % 50 == 0).map { case (id, e) => id -> q64(e) }
    val exp = (0 to 3).flatMap { qb =>
      val members = stateAt(qb).toSeq.map { case (id, e) =>
        val q = q64(e)
        (id, q, seedMap.toSeq.map { case (c, cv) => (dist(q, cv), c) }.min._2)
      }
      queries.flatMap { case (qid, qq) =>
        val probed = seedMap.toSeq.map { case (c, cv) => (dist(qq, cv), c) }
          .sorted.take(2).map(_._2).toSet
        val cand = members.collect {
          case (vid, q, c) if probed(c) && vid != qid => (dist(qq, q), vid)
        }.sorted.take(3)
        cand.zipWithIndex.map { case ((d2, vid), i) =>
          (qb.toLong, qid, i + 1L) -> ((vid, d2)) }
      }
    }.toMap
    assert(got == exp, "drained serving output must equal per-batch rebuilds")
    // the serving property itself: the SAME query set gets different
    // answers after mid-stream index merges
    assert(queries.exists { case (qid, _) =>
      (1 to 3).map(r => got.get((0L, qid, r.toLong))) !=
        (1 to 3).map(r => got.get((3L, qid, r.toLong))) },
      "index evolution must change some query's top-3 across batches")
  }

  test("IVF cell split equals the driver-side replay and rebalances overflow") {
    val sf = sf0001
    val got = Catalog.queries("ann_ivf_cell_split")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val base = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toVector)
    def q64(e: Vector[Float]): Vector[Long] =
      e.map(x => math.floor(x.toDouble * 64.0 + 0.5).toLong)
    def dist(a: Vector[Long], b: Vector[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val seeds = base.filter(_._1 < 16).map { case (c, e) => (c, q64(e)) }
    val asg = base.map { case (id, e) =>
      val q = q64(e)
      (id, q, seeds.map { case (c, cv) => (dist(q, cv), c) }.min._2)
    }
    val cap = asg.length / 16
    val over = asg.groupBy(_._3).filter(_._2.length > cap).keySet
    val exp = asg.groupBy(_._3).toSeq.flatMap { case (cell, members) =>
      if (!over(cell)) members.map { case (id, _, _) => id -> cell }
      else {
        val q0 = members.minBy(_._1)._2
        val q1 = members.map { case (id, q, _) => ((-dist(q, q0), id), q) }
          .minBy(_._1)._2
        members.map { case (id, q, _) =>
          id -> (if (dist(q, q1) < dist(q, q0)) cell * 2 + 1001
                 else cell * 2 + 1000)
        }
      }
    }.toMap
    assert(got == exp, "split assignment must equal the driver replay")
    // the rebalance property: at least one cell actually split, BOTH of
    // its children are non-empty (the 2-means step separated members,
    // not renamed them), and child ids never collide with kept ids
    assert(over.nonEmpty, "sf0.001 must have at least one overflowing cell")
    val childCells = got.values.filter(_ >= 1000L).toSet
    assert(over.exists(c => childCells(c * 2 + 1000) && childCells(c * 2 + 1001)),
      "a split must populate both children")
    assert(got.values.toSet.intersect((0L until 16L).toSet).forall(!over.contains(_)),
      "kept ids come only from under-cap cells")
  }

  test("auto-split maintained index equals the full driver replay; C grows, populations re-cap") {
    val sf = sf0001
    val got = Catalog.queries("ann_cdc_autosplit_index")(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val base = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toVector)
    def q64(e: Vector[Float]): Vector[Long] =
      e.map(x => math.floor(x.toDouble * 64.0 + 0.5).toLong)
    def rot(e: Vector[Float], b: Int): Vector[Float] = e.drop(b) ++ e.take(b)
    def dist(a: Vector[Long], b: Vector[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    var cents: Map[Long, Vector[Long]] =
      base.filter(_._1 < 16).map { case (c, e) => c -> q64(e) }.toMap
    var state = Map.empty[Long, (Vector[Long], Long)]
    var splitEvents = 0
    def applyBatch(ups: Seq[(Long, Vector[Float])], delKeys: Set[Long]): Unit = {
      state = state -- delKeys
      ups.foreach { case (id, e) =>
        val q = q64(e)
        val cell = cents.toSeq.map { case (c, cv) => (dist(q, cv), c) }.min._2
        state += id -> ((q, cell))
      }
      // one split round, the entry's exact rule (cap tracks sqrt(N_live))
      val cap = math.max(36L, math.floor(math.sqrt(state.size.toDouble)).toLong)
      val over = state.values.groupBy(_._2).filter(_._2.size > cap).keySet
      over.foreach { cell =>
        val members = state.filter(_._2._2 == cell).toSeq
        val q0 = members.minBy(_._1)._2._1
        val q1 = members.map { case (id, (q, _)) => ((-dist(q, q0), id), q) }
          .minBy(_._1)._2
        members.foreach { case (id, (q, _)) =>
          val nc = if (dist(q, q1) < dist(q, q0)) cell * 2 + 1001 else cell * 2 + 1000
          state += id -> ((q, nc))
        }
        cents = cents - cell + ((cell * 2 + 1000) -> q0) + ((cell * 2 + 1001) -> q1)
        splitEvents += 1
      }
    }
    applyBatch(base.toSeq, Set.empty)
    (1 to 3).foreach { b =>
      val ups = base.collect { case (id, e) if id % 10 == b => (id, rot(e, b)) } ++
        base.collect { case (id, e) if id % 23 == b => (id + 1000000L * b, rot(e, b + 3)) }
      val dels = base.collect {
        case (id, _) if id % 17 == b && id % 10 != b => id }.toSet
      applyBatch(ups.toSeq, dels)
    }
    val exp = state.map { case (id, (q, cell)) =>
      id -> ((cell, q.zipWithIndex.map { case (v, i) => (i + 1) * v }.sum))
    }
    assert(got == exp, "auto-split maintained index must equal the driver replay")
    // the lever is LIVE: splits fired, C grew past the seed count, split
    // parents retired (no member carries a split cell id), and the probe
    // entry serves from the same evolved state
    assert(splitEvents > 0, "at least one cell must split at sf0.001")
    assert(cents.size > 16, s"C must grow past the 16 seeds, got ${cents.size}")
    val liveCells = got.values.map(_._1).toSet
    assert(liveCells.subsetOf(cents.keySet), "members live only in current cells")
    val probed = Catalog.queries("ann_cdc_autosplit_probe")(spark, sf).collect()
    assert(probed.nonEmpty)
    probed.foreach(r => assert(got.contains(r.getLong(0)), "query must be a live row"))
  }

  test("adaptive LSH buckets: dense buckets split by appended hyperplane bits; a truncated close neighbor becomes a candidate") {
    import graft.functions.Similarity
    val e = Tables.embeddings(spark, sf0001).select(col("vec_id"), col("embedding"))
    val cap = 4L // force density: real sf0.001 buckets run up to ~20 members
    val got = ScaleOpsQueries.lshAdaptiveBuckets(e, cap).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3))).toSet
    // full driver re-derivation of the split rule from raw hyperplane signs
    val vecs = e.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def bit(plane: Int, v: Array[Float]): Long = {
      val dot = (0 until 64).map(k =>
        Similarity.hyperplaneSign(plane, k) * v(k).toDouble).sum
      if (dot > 0) 1L else 0L
    }
    def bucket6(t: Int, v: Array[Float]): Long =
      (0 until 6).map(j => bit(t * 6 + j, v) << j).sum
    var assign: Map[(Long, Int), (Int, Long)] =
      (for ((id, v) <- vecs.toSeq; t <- 0 to 1)
        yield (id, t) -> (6, bucket6(t, v))).toMap
    (0 until ScaleOpsQueries.LshSplitLevels).foreach { l =>
      val cnt = assign.toSeq.groupBy { case ((_, t), (nb, b)) => (t, nb, b) }
        .map { case (k, xs) => k -> xs.size }
      assign = assign.map { case ((id, t), (nb, b)) =>
        if (cnt((t, nb, b)) > cap)
          ((id, t), (nb + 1, b * 2 + bit(12 + 6 * t + l, vecs(id))))
        else ((id, t), (nb, b))
      }
    }
    val exp = assign.map { case ((id, t), (nb, b)) => (id, t, nb, b) }.toSet
    assert(got == exp, s"adaptive buckets diverged from the driver replay " +
      s"(got ${got.size}, expected ${exp.size})")
    assert(exp.exists(_._3 >= 8), "a dense bucket must split through 2+ levels at cap=4")
    assert(exp.exists(_._3 == 6), "sparse buckets must stay unsplit")
    // the recall claim: candidate pairs under the OLD fixed rule (first
    // cap per 6-bit bucket) vs the split rule — splitting must surface a
    // previously-dropped pair that is genuinely CLOSE (closer than the
    // old candidate set's farthest member for that vector)
    def mates(groups: Map[(Int, Int, Long), Seq[Long]]): Set[(Long, Long)] =
      groups.toSeq.flatMap { case (_, members) =>
        val m = members.sorted.take(cap.toInt)
        members.flatMap(u => m.filter(_ != u).map(u -> _))
      }.toSet
    val oldCands = mates(
      (for ((id, v) <- vecs.toSeq; t <- 0 to 1) yield ((t, 6, bucket6(t, v)), id))
        .groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2) })
    val newCands = mates(exp.toSeq.groupBy(x => (x._2, x._3, x._4))
      .map { case (k, xs) => k -> xs.map(_._1).toSeq })
    val gained = newCands -- oldCands
    assert(gained.nonEmpty, "splitting must surface candidates the fixed cap dropped")
    def d2(a: Long, b: Long): Long = {
      def q(x: Float): Long = math.floor(x.toDouble * 64.0 + 0.5).toLong
      vecs(a).zip(vecs(b)).map { case (x, y) => (q(x) - q(y)) * (q(x) - q(y)) }.sum
    }
    val gainedClose = gained.exists { case (u, v) =>
      val old = oldCands.filter(_._1 == u).map(p => d2(u, p._2))
      old.nonEmpty && d2(u, v) < old.max
    }
    assert(gainedClose,
      "some surfaced candidate must be closer than the old set's farthest — " +
        "the recall the fixed cap was silently dropping")
    // the residual-truncation gate: a declared regime, not silence. The
    // case splitting provably cannot fix — a cluster of IDENTICAL vectors
    // shares every hyperplane bit, so both levels re-bucket it wholesale
    // and the mates cap still drops most of it: the gate must trip loudly
    val clones = e.limit(1).select(col("embedding"))
      .crossJoin(spark.range(100).select(col("id").as("vec_id")))
      .select(col("vec_id"), col("embedding"))
    val ex = intercept[IllegalArgumentException] {
      ScaleOpsQueries.lshMatesCapped(
        ScaleOpsQueries.lshAdaptiveBuckets(clones, cap), cap, "spec")
    }
    assert(ex.getMessage.contains("split"), ex.getMessage)
    val okCap = ScaleOpsQueries.lshBucketCapFor(vecs.size.toLong)
    ScaleOpsQueries.lshMatesCapped(
      ScaleOpsQueries.lshAdaptiveBuckets(e, okCap), okCap, "spec").count()
  }

  /** Driver replay of the NN-Descent construction: returns (quantized
    * vectors, LSH-init graph, round-1 graph, final round-2 graph). */
  private def nnDescentReplay(sf: String)
    : (Map[Long, Vector[Long]], Map[Long, Seq[Long]], Map[Long, Seq[Long]],
       Map[Long, Seq[Long]]) = {
    val base = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toVector)
    val q = base.map { case (id, e) =>
      id -> e.map(x => math.floor(x.toDouble * 64.0 + 0.5).toLong) }.toMap
    def dist(a: Long, b: Long): Long =
      q(a).zip(q(b)).map { case (x, y) => (x - y) * (x - y) }.sum
    val buckets = (0 until 2).map { t =>
      base.map { case (id, e) =>
        id -> (0 until 6).map { j =>
          val dot = (0 until 64).map(k =>
            graft.functions.Similarity.hyperplaneSign(t * 6 + j, k) * e(k).toDouble).sum
          if (dot > 0) 1L << j else 0L
        }.sum }.toMap
    }
    def topk(cand: Map[Long, Set[Long]]): Map[Long, Seq[Long]] =
      cand.map { case (u, vs) =>
        u -> vs.toSeq.map(v => (dist(u, v), v)).sorted.take(8).map(_._2) }
    val ids = base.map(_._1)
    // mates side width-capped: first 64 members per (table, bucket) by id
    // — the entry's production bucket-width cap (inert at this SF)
    val capped = buckets.zipWithIndex.map { case (bkm, _) =>
      bkm.toSeq.groupBy(_._2).map { case (b, xs) =>
        b -> xs.map(_._1).sorted.take(64).toSet }
    }
    val init = topk(ids.map(u =>
      u -> ids.filter(v => v != u && buckets.indices.exists(t =>
        capped(t).getOrElse(buckets(t)(u), Set.empty).contains(v))).toSet).toMap
      .filter(_._2.nonEmpty))
    def round(n: Map[Long, Seq[Long]]): Map[Long, Seq[Long]] = {
      val undirected = n.toSeq.flatMap { case (u, vs) =>
        vs.flatMap(v => Seq(u -> v, v -> u)) }
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
      val cand = undirected.map { case (u, mids) =>
        u -> (mids.flatMap(m => undirected.getOrElse(m, Set.empty)) - u ++
          n.getOrElse(u, Nil).toSet) }.filter(_._2.nonEmpty)
      topk(cand)
    }
    val n1 = round(init)
    (q, init, n1, round(n1))
  }

  test("maintained k-NN graph equals the delta-step replay; revisions update neighborhoods; beam serves from it") {
    val sf = sf0001
    val got = Catalog.queries("ann_cdc_maintained_knn_graph")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val base = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toVector)
    def q64(e: Vector[Float]): Vector[Long] =
      e.map(x => math.floor(x.toDouble * 64.0 + 0.5).toLong)
    def rot(e: Vector[Float], b: Int): Vector[Float] = e.drop(b) ++ e.take(b)
    def buckets(e: Vector[Float]): Set[(Int, Long)] = (0 until 2).map { t =>
      t -> (0 until 6).map { j =>
        val dot = (0 until 64).map(k =>
          graft.functions.Similarity.hyperplaneSign(t * 6 + j, k) * e(k).toDouble).sum
        if (dot > 0) 1L << j else 0L
      }.sum
    }.toSet
    val (_, _, _, g0) = nnDescentReplay(sf)
    var vecs: Map[Long, Vector[Float]] = base.toMap
    var graph: Map[Long, Seq[Long]] = g0
    var bystanderUpdated = false
    (1 to 3).foreach { b =>
      val chg: Map[Long, Vector[Float]] =
        base.collect { case (id, e) if id % 10 == b => id -> rot(e, b) }.toMap ++
          base.collect { case (id, e) if id % 23 == b =>
            (id + 1000000L * b) -> rot(e, b + 3) }.toMap
      val dels = base.collect {
        case (id, _) if id % 17 == b && id % 10 != b => id }.toSet
      val und = graph.toSeq.flatMap { case (u, vs) => vs.flatMap(v => Seq(u -> v, v -> u)) }
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
      vecs = vecs -- dels ++ chg
      val qmap = vecs.map { case (id, e) => id -> q64(e) }
      def dist(a: Long, bb: Long): Long =
        qmap(a).zip(qmap(bb)).map { case (x, y) => (x - y) * (x - y) }.sum
      val keys = chg.keySet ++ dels
      val touched = (chg.keySet ++
        und.collect { case (u, vs) if vs.exists(keys) => u }).filter(vecs.contains)
      val bkts = vecs.map { case (id, e) => id -> buckets(e) }
      // the mates side is width-capped: first 64 members per (tbl, bucket)
      // by id — the entry's production bucket-width cap (inert at this SF)
      val bucketMembers = bkts.toSeq
        .flatMap { case (id, bs) => bs.map(b => b -> id) }
        .groupBy(_._1).map { case (b, xs) => b -> xs.map(_._2).sorted.take(64) }
      val newLists = touched.map { u =>
        val one = und.getOrElse(u, Set.empty)
        val two = one.flatMap(m => und.getOrElse(m, Set.empty))
        val lsh = bkts(u).flatMap(b => bucketMembers.getOrElse(b, Nil)).toSet - u
        val cand = (one ++ two ++ lsh - u).filter(vecs.contains)
        u -> cand.toSeq.map(v => (dist(u, v), v)).sorted.take(8).map(_._2)
      }.toMap
      // the planted-revision signal: some vertex that did NOT itself
      // change gets a different list because a neighbor moved/died
      if (newLists.exists { case (u, l) =>
        !keys(u) && graph.getOrElse(u, Nil) != l }) bystanderUpdated = true
      graph = graph -- dels ++ newLists
    }
    val exp = graph.toSeq.flatMap { case (u, vs) =>
      vs.zipWithIndex.map { case (v, i) => (u, i + 1L, v) } }.toSet
    assert(got == exp, s"got ${got.size} rows, expected ${exp.size}")
    assert(bystanderUpdated,
      "a vector revision must update some unchanged vertex's neighborhood")
    assert(graph.keys.exists(_ > 1000000L), "inserted vectors must have lists")
    // the serve entry walks the SAME maintained graph over live vectors
    val served = Catalog.queries("ann_graph_beam_serve_maintained")(spark, sf).collect()
    assert(served.nonEmpty)
    served.foreach { r =>
      assert(vecs.contains(r.getLong(0)), "query must be a live vector")
      assert(vecs.contains(r.getLong(2)), "answer must be a live vector")
    }
  }

  test("retired-centroid archive and live centroids partition the split history") {
    val rows = Catalog.queries("ann_autosplit_retired_cells")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.nonEmpty, "splits must retire some parents at this SF")
    val retired = rows.map(_._2).toSet
    val (_, centsOne) = ScaleOpsQueries.annAutosplitIndex(spark, sf0001)
    val live = centsOne.select(explode(col("cs")).as("c"))
      .select(col("c.cell")).collect().map(_.getLong(0)).toSet
    assert(retired.intersect(live).isEmpty, "a retired cell cannot still serve")
    // lineage: every live child's parent is exactly a retired cell
    live.filter(_ >= 1000L).foreach { c =>
      val p = if ((c - 1000L) % 2 == 0) (c - 1000L) / 2 else (c - 1001L) / 2
      assert(retired.contains(p), s"live child $c's parent $p must be archived")
    }
    // and every retired cell actually has both children somewhere in the
    // history (live or themselves later retired)
    val all = live ++ retired
    retired.foreach { p =>
      assert(all.contains(p * 2 + 1000) && all.contains(p * 2 + 1001),
        s"retired $p must have split into two children")
    }
  }

  test("delta-maintained reverse adjacency equals the from-scratch reverse of the final graph") {
    // The rev sink is maintained per batch by the touched-endpoint delta
    // rule (never rebuilt from a graph flatten); equality with the
    // reverse adjacency DERIVED from the final forward graph pins every
    // row — including bystanders: a vertex that never changed its own
    // vector must still see its reverse list updated when a neighbor's
    // rewritten list starts or stops naming it.
    val sf = sf0001
    val (g, _) = ScaleOpsQueries.annMaintainedKnnGraph(spark, sf)
    val rev = ScaleOpsQueries.annMaintainedRevIndex(spark, sf)
    val fwd = g.read().collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    val gotRev = rev.read().collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    val expRev: Map[Long, Vector[Long]] = fwd.toSeq
      .flatMap { case (w, vs) => vs.map(v => v -> w) }
      .groupBy(_._1).map { case (a, xs) => a -> xs.map(_._2).distinct.sorted.toVector }
    expRev.foreach { case (a, exp) =>
      assert(gotRev.getOrElse(a, Vector()) == exp, s"rev($a) diverged") }
    gotRev.foreach { case (a, got) =>
      if (got.nonEmpty) assert(expRev.get(a).contains(got), s"stale rev($a)") }
    // the delta rule must have produced updates for vertices that never
    // themselves changed (the bystander signal: reverse edges exist for
    // inserted vectors' neighbors, which only batch >= 1 could write)
    assert(expRev.keys.exists(_ > 1000000L) || gotRev.keys.exists(_ > 1000000L),
      "inserted vectors must appear in someone's reverse list eventually")
  }

  test("NN-Descent graph equals a driver replay; recall improves monotonically") {
    val sf = sf0001
    val got = Catalog.queries("ann_nn_descent_graph")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val (q, init, n1, n2) = nnDescentReplay(sf)
    def dist(a: Long, b: Long): Long =
      q(a).zip(q(b)).map { case (x, y) => (x - y) * (x - y) }.sum
    val exp = n2.toSeq.flatMap { case (u, vs) =>
      vs.zipWithIndex.map { case (v, i) => (u, i + 1L, v) } }.toSet
    assert(got == exp, s"got ${got.size} rows, expected ${exp.size}")
    // quality: recall vs the brute-force 4-NN truth never degrades over
    // rounds, and the final graph beats the LSH init outright
    val ids = q.keys.toSeq
    val truth = ids.map { u =>
      u -> ids.filter(_ != u).map(v => (dist(u, v), v)).sorted.take(4).map(_._2).toSet
    }.toMap
    def recall(n: Map[Long, Seq[Long]]): Double =
      ids.map(u => n.getOrElse(u, Nil).toSet.intersect(truth(u)).size).sum.toDouble /
        (ids.length * 4.0)
    val (r0, r1, r2) = (recall(init), recall(n1), recall(n2))
    assert(r0 <= r1 && r1 <= r2, s"recall must not degrade: $r0 -> $r1 -> $r2")
    assert(r2 > r0, s"two NN-Descent rounds must beat the LSH init ($r0 -> $r2)")
  }

  test("beam search over the k-NN graph equals a driver replay; per-hop recall monotone") {
    val sf = sf0001
    val got = Catalog.queries("ann_graph_beam_search")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val (q, _, _, n2) = nnDescentReplay(sf)
    def dist(a: Long, b: Long): Long =
      q(a).zip(q(b)).map { case (x, y) => (x - y) * (x - y) }.sum
    val g = n2.toSeq.flatMap { case (u, vs) => vs.flatMap(v => Seq(u -> v, v -> u)) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    val ids = q.keys.toSeq
    val queries = ids.filter(_ % 11 == 0)
    val entry = ids.min
    def hop(beams: Map[Long, Seq[Long]]): Map[Long, Seq[Long]] =
      beams.map { case (qid, beam) =>
        val cand = (beam.toSet ++ beam.flatMap(v => g.getOrElse(v, Set.empty))) - qid
        qid -> cand.toSeq.map(v => (dist(qid, v), v)).sorted.take(4).map(_._2)
      }
    val b0 = queries.map(_ -> Seq(entry)).toMap
    val b1 = hop(b0); val b2 = hop(b1); val b3 = hop(b2)
    val exp = b3.toSeq.flatMap { case (qid, beam) =>
      beam.take(3).zipWithIndex.map { case (v, i) =>
        (qid, i + 1L, v, dist(qid, v)) } }.toSet
    assert(got == exp, s"got ${got.size} rows, expected ${exp.size}")
    // quality: recall@3 vs the brute-force truth is monotone per hop and
    // the 3-hop answer strictly beats the entry-point-only baseline
    val truth = queries.map { u =>
      u -> ids.filter(_ != u).map(v => (dist(u, v), v)).sorted.take(3).map(_._2).toSet
    }.toMap
    def recall(b: Map[Long, Seq[Long]]): Double =
      queries.map(u => b(u).take(3).toSet.intersect(truth(u)).size).sum.toDouble /
        (queries.size * 3.0)
    val (r0, r1, r2, r3) = (recall(b0), recall(b1), recall(b2), recall(b3))
    assert(r1 <= r2 && r2 <= r3, s"beam recall must not degrade: $r1 -> $r2 -> $r3")
    assert(r3 > r0, s"3-hop beam must beat the entry-point baseline ($r0 -> $r3)")
  }

  test("knnApplyBatch: forced scan and point regimes land identical end states") {
    // The cost-based regime switch (r14 verdict #1) makes the batch loop
    // bimodal, and harness-scale batches (~10% of these corpora) all take
    // the SCAN regime wherever the oracle runs — so the point-read loop,
    // the 100 TB steady-state path, would otherwise be pinned only at the
    // index level (LshIndexSpec) and by the assertion-free knnbatch
    // stress row. This applies the SAME batch to two filesystem clones of
    // the same maintained state through knnApplyBatch's forcing seam and
    // asserts every sink's end state identical: vectors, forward graph,
    // reverse adjacency, LSH member rows (sign bits included), leaf
    // counts, and the serve entry-point buffer.
    import spark.implicits._
    val sf = sf0001
    ScaleOpsQueries.annMaintainedKnnGraph(spark, sf) // cached across the suite
    val w0 = ScaleOpsQueries.knnWorkDir(sf)
    val hconf = spark.sparkContext.hadoopConfiguration
    val hfs = new org.apache.hadoop.fs.Path(w0).getFileSystem(hconf)
    val base = Tables.load(spark, sf, "embeddings")
    val qx = expr(
      "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 64.0 + 0.5) AS BIGINT))")
    // disjoint update/delete key sets, the loop's at-most-one-op-per-key
    // discipline (one fresh insert rides along via the +1e6 id)
    val chg = base.filter(col("vec_id") % 13 === 0 && col("vec_id") % 29 =!= 0)
      .limit(20)
      .select(col("vec_id"),
        expr("concat(slice(embedding, 6, 59), slice(embedding, 1, 5))").as("embedding"))
      .unionByName(base.filter(col("vec_id") % 31 === 7).limit(1)
        .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding")))
      .select(col("vec_id"), col("embedding"), qx.as("q")).localCheckpoint()
    val delIds = base.filter(col("vec_id") % 29 === 0 && col("vec_id") % 13 =!= 0)
      .limit(10).select(col("vec_id")).localCheckpoint()
    def applyTo(tag: String, force: Boolean): (Long, Map[String, Set[Seq[Any]]]) = {
      val w = Q.scratch(s"knnregime$tag")
      org.apache.hadoop.fs.FileUtil.copy(hfs, new org.apache.hadoop.fs.Path(w0),
        hfs, new org.apache.hadoop.fs.Path(s"$w/state"), false, hconf)
      val p = s"$w/state"
      val vecs = new graft.sinks.SnapshotSink(spark, s"$p/vecs", Seq("vec_id"), numBuckets = 16)
      val graph = new graft.sinks.SnapshotSink(spark, s"$p/graph", Seq("u"), numBuckets = 16)
      val rev = new graft.sinks.SnapshotSink(spark, s"$p/rev", Seq("u"), numBuckets = 16)
      val lshb = new graft.sinks.SnapshotSink(spark, s"$p/lshb",
        Seq("tbl", "nbits", "bucket", "vec_id"), numBuckets = 16,
        bucketBy = Seq("tbl", "nbits", "bucket"))
      val lshcnt = new graft.sinks.SnapshotSink(spark, s"$p/lshcnt",
        Seq("tbl", "nbits", "bucket"))
      val meta = new graft.sinks.SnapshotSink(spark, s"$p/meta", Seq("k"), numBuckets = 1)
      val nLive0 = vecs.read().count()
      val nLive = ScaleOpsQueries.knnApplyBatch(spark, vecs, graph, rev,
        lshb, lshcnt, meta, chg, delIds, nLive0, 50L, forceScan = Some(force))
      def dump(name: String, df: org.apache.spark.sql.DataFrame, cols: String*) =
        name -> df.select(cols.map(col): _*).collect()
          .map(_.toSeq.map {
            case s: scala.collection.Seq[_] => s.toVector
            case x => x
          }).toSet
      (nLive, Map(
        dump("vecs", vecs.read(), "vec_id", "embedding", "q"),
        dump("graph", graph.read(), "u", "nbrs"),
        dump("rev", rev.read(), "u", "rnbrs"),
        dump("lshb", lshb.read(), "tbl", "nbits", "bucket", "vec_id", "sbits"),
        dump("lshcnt", lshcnt.read(), "tbl", "nbits", "bucket", "n"),
        dump("meta", meta.read(), "k", "ids")))
    }
    val (nP, statesP) = applyTo("pt", force = false)
    val (nS, statesS) = applyTo("sc", force = true)
    assert(nP == nS, s"live counts diverge: point=$nP scan=$nS")
    statesP.keys.foreach { k =>
      assert(statesP(k) == statesS(k),
        s"sink '$k' end states diverge between regimes " +
          s"(point=${statesP(k).size} rows, scan=${statesS(k).size} rows)")
    }
  }

  test("serve entry-point min-buffer: boundary-filtered arrivals + underflow " +
      "refill keep ids[0] the exact live minimum under adversarial drains") {
    // The exact counterexample the invariant exists for: delete part of
    // the buffer while inserting ABOVE its old max, then drain the rest.
    // An unfiltered union would admit the high insert and serve it as the
    // "minimum" once the survivors drain; the boundary filter must keep
    // it out, and draining every id at or below the boundary must fire
    // the declared refill scan, which restores the true bottom-64.
    import spark.implicits._
    val sf = sf0001
    ScaleOpsQueries.annMaintainedKnnGraph(spark, sf)
    val w0 = ScaleOpsQueries.knnWorkDir(sf)
    val hconf = spark.sparkContext.hadoopConfiguration
    val hfs = new org.apache.hadoop.fs.Path(w0).getFileSystem(hconf)
    val w = Q.scratch("knnentrybuf")
    org.apache.hadoop.fs.FileUtil.copy(hfs, new org.apache.hadoop.fs.Path(w0),
      hfs, new org.apache.hadoop.fs.Path(s"$w/state"), false, hconf)
    val p = s"$w/state"
    val vecs = new graft.sinks.SnapshotSink(spark, s"$p/vecs", Seq("vec_id"), numBuckets = 16)
    val graph = new graft.sinks.SnapshotSink(spark, s"$p/graph", Seq("u"), numBuckets = 16)
    val rev = new graft.sinks.SnapshotSink(spark, s"$p/rev", Seq("u"), numBuckets = 16)
    val lshb = new graft.sinks.SnapshotSink(spark, s"$p/lshb",
      Seq("tbl", "nbits", "bucket", "vec_id"), numBuckets = 16,
      bucketBy = Seq("tbl", "nbits", "bucket"))
    val lshcnt = new graft.sinks.SnapshotSink(spark, s"$p/lshcnt",
      Seq("tbl", "nbits", "bucket"))
    val meta = new graft.sinks.SnapshotSink(spark, s"$p/meta", Seq("k"), numBuckets = 1)
    def liveIds(): Seq[Long] =
      vecs.read().select("vec_id").as[Long].collect().sorted.toSeq
    def entryIds(): Seq[Long] = meta.read().filter(col("k") === "entry")
      .select(explode(col("ids")).as("i")).as[Long].collect().sorted.toSeq
    def batch(b: Long, nBefore: Long, dels: Seq[Long], ins: Seq[(Long, Long)]): Long = {
      // an insert clones a live donor's embedding (rotated) under a new id
      val chg =
        if (ins.isEmpty)
          vecs.read().limit(0).select(col("vec_id"), col("embedding"), col("q"))
        else ins.map { case (newId, donor) => (newId, donor) }
          .toDF("new_id", "vec_id")
          .join(vecs.read().select(col("vec_id"), col("embedding")), Seq("vec_id"))
          .select(col("new_id").as("vec_id"),
            expr("concat(slice(embedding, 4, 61), slice(embedding, 1, 3))").as("embedding"))
          .select(col("vec_id"), col("embedding"), expr(
            "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 64.0 + 0.5) AS BIGINT))").as("q"))
      ScaleOpsQueries.knnApplyBatch(spark, vecs, graph, rev, lshb, lshcnt,
        meta, chg.localCheckpoint(), dels.toDF("vec_id").localCheckpoint(),
        nBefore, b)
    }
    val live0 = liveIds()
    val buf0 = entryIds()
    assert(buf0.head == live0.head, "precondition: the built buffer serves the min")
    // batch: delete the buffer's bottom 10, insert one id far above its max
    val n1 = batch(60L, live0.size.toLong, buf0.take(10), Seq(2000000L -> live0.last))
    val buf1 = entryIds()
    assert(buf1.head == liveIds().head,
      s"after partial drain + high insert: ids[0]=${buf1.head} must be the live min")
    assert(!buf1.contains(2000000L),
      "an arrival above the old boundary must NOT enter the buffer")
    // batch: drain every remaining old-buffer id -> the filtered union
    // empties -> the declared refill recomputes the bottom-64
    batch(61L, n1, buf1, Nil)
    val buf2 = entryIds()
    val liveNow = liveIds()
    assert(buf2 == liveNow.take(buf2.size),
      s"after the full drain the refill must restore the exact bottom ids " +
        s"(got head ${buf2.headOption}, live min ${liveNow.headOption})")
    assert(buf2.head == liveNow.head && buf2.head != 2000000L,
      "ids[0] must be the true live minimum, not the drained-in high insert")
  }
}
