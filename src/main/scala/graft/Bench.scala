package graft

import graft.analytics.Catalog
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main: times the headline queries (Catalog.benchNames) on
  * SPARK_GRAFT_SF_DIR and prints one JSON line.
  *
  * Timings are reported twice: `queries_cold` is the first execution
  * (includes file listing, JIT, codegen compilation), `queries` is the
  * second, steady-state execution — the number comparable across rounds.
  * The JSON line is printed to stdout AND stderr AND written to
  * SPARK_GRAFT_BENCH_OUT (default ./bench_out.json) so the driver can
  * parse it even when a build tool prefixes or swallows stdout.
  */
object Bench {

  /** Prof-label prefixes whose per-phase times the bench artifact carries
    * (for the warm pass of record): lines whose cost is phase-structured,
    * so a probe/skip-path regression is separable from init drift without
    * a ProfileOne session. BenchSpec pins that the forest-cut line
    * actually produces these keys.
    */
  private[graft] val benchPhasePrefixes: Seq[String] = Seq("forestcut/")

  /** Two warm passes disagreeing by > 1.5× is host noise spanning one
    * pass, not the query — the `contended` marker (pure, unit-tested).
    */
  private[graft] def isContended(w1: Double, w2: Double): Boolean =
    math.max(w1, w2) > 1.5 * math.min(w1, w2)

  /** The cold pass beating every warm pass is impossible for a healthy
    * steady state (cold includes codegen + file listing): it means
    * in-process accumulation or a contended warm window — the r08
    * artifact shape (5.94 → 8.01 → 11.03) that the w1-vs-w2 check alone
    * could not flag. A 5% relative margin keeps ordinary run-to-run
    * noise on negligible-codegen queries (cold ≈ warm ± ε) from burning
    * a recovery pass — only a genuine inversion fires. The `inverted`
    * marker (pure, unit-tested).
    *
    * The recovery pass the trigger buys ADJUDICATES the flag: genuine
    * accumulation only grows within the pass loop, so its warm floor
    * stays above cold and the flag stands (the r08 shape); a recovery
    * that comes back under the margin refutes the accumulation
    * hypothesis — the earlier warm excess was window noise, and the
    * pass of record (the warm min, now ≈/≤ cold) IS steady-state. The
    * caller re-evaluates this predicate WITH the recovery pass included
    * and flags only a persisting inversion. Measured need (r14→r15):
    * the forest-cut line runs late in a fully-warmed JVM, so its cold
    * has no codegen premium and its warm band is per-job-overhead noise
    * ±8% — wider than the 5% margin; 5 same-JVM warm passes profiled
    * FLAT (no accumulation), yet the three-sample window flagged once
    * per round until the recovery pass was allowed to overturn it.
    */
  private[graft] def isInverted(cold: Double, warms: Seq[Double]): Boolean =
    cold < 0.95 * warms.min

  /** Host-calibration probe: a fixed synthetic shuffle+agg over
    * `spark.range` — constant row count, zero file I/O, independent of
    * the SF dir — so its wall time measures only how fast THIS host runs
    * a shuffle this session. Round-over-round artifact deltas divide out
    * host drift via the ratio of `calib_sec` values (r09's 39.1 s warm
    * vs r08's 33.6 s was pure host drift — the unchanged q1 control
    * inflated 1.43× — and nothing in the artifact could show it).
    */
  private[graft] def calibFrame(
      spark: SparkSession,
      rows: Long = 20000000L,
      keys: Long = 1000000L,
      parts: Int = 32): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    spark.range(0L, rows, 1L, parts)
      .select((org.apache.spark.sql.functions.col("id") % keys).as("k"),
        org.apache.spark.sql.functions.col("id").as("v"))
      .groupBy("k")
      .agg(sum("v").as("s"), count(lit(1)).as("c"))
  }

  /** The calibration number: first pass pays codegen and is discarded;
    * the min of the remaining passes is the host-speed measurement
    * (pure, unit-tested).
    */
  private[graft] def calibSummary(passes: Seq[Double]): Double = {
    require(passes.size >= 2, "calibration needs a warmup pass plus one measured")
    passes.drop(1).min
  }

  /** Second calibration probe — the FILE-I/O twin of [[calibFrame]]. The
    * r10 verdict showed the pure shuffle+agg probe normalizes same-host
    * drift almost exactly (totals ratio 1.178 vs calib ratio 1.188 on the
    * driver-vs-judge pair) but does NOT extrapolate across hosts: the
    * headliner set is dominated by parquet scan/decode and stream-start
    * costs a shuffle probe never touches. This probe writes a FIXED
    * synthetic parquet once (content deterministic, size independent of
    * the SF dir) and times read+aggregate over it, so `calib_io_sec`
    * measures the host's file-path speed (listing, footer decode,
    * decompression, row-group decode) the same way `calib_sec` measures
    * its shuffle speed. Scan-bound query deltas normalize against
    * `calib_io_sec`; shuffle/agg-bound deltas against `calib_sec`
    * (SURVEY §8 records which headliner is which).
    */
  private[graft] def calibIoSetup(spark: SparkSession, dir: String,
      rows: Long = 20000000L, parts: Int = 32): Unit = {
    import org.apache.spark.sql.functions._
    // v is modular so sum(v) stays far under Long.Max at any probe size
    // (ANSI sum overflow would throw); pmod keeps it closed-form testable
    spark.range(0L, rows, 1L, parts)
      .select(col("id").as("k"), pmod(col("id") * 31L, lit(1000000L)).as("v"))
      .write.mode("overwrite").parquet(dir)
  }

  private[graft] def calibIoFrame(spark: SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    // sum both columns: every row group is read and decoded end-to-end,
    // and the single-row aggregate keeps shuffle out of the measurement
    spark.read.parquet(dir).agg(sum("k").as("sk"), sum("v").as("sv"))
  }

  /** Third calibration probe — per-JOB fixed overhead (`calib_job_sec`).
    * The maintained/serving headliners are JOB-COUNT-bound: dozens of
    * tiny point-read / bounded-collect jobs per batch whose cost is
    * scheduler + task-launch + result-fetch, not shuffle or scan — a
    * class neither `calib_sec` nor `calib_io_sec` tracks (r14: calib_sec
    * spanned 0.83–1.07 across windows while the job-overhead-bound
    * maintained lines moved ±20% uncorrelated with it). One probe pass
    * runs `jobs` trivial `parts`-task jobs back to back — zero rows per
    * partition, no shuffle, no files — and reports the total; the ratio
    * of `calib_job_sec` across windows normalizes exactly those lines
    * (SURVEY §8.8 records which headliner normalizes against which
    * probe). Returns the pass wall time; correctness is pinned by the
    * closed-form count the driver asserts per job.
    */
  private[graft] def calibJobPass(spark: SparkSession, jobs: Int = 32,
      parts: Int = 32): Double = {
    val empty = spark.sparkContext.parallelize(Seq.empty[Int], parts)
    val t0 = System.nanoTime()
    var i = 0
    while (i < jobs) {
      require(empty.count() == 0L, "calibJob probe: empty-partition job")
      i += 1
    }
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // noop write forces full materialization of every output column
    // (count() can shortcut scans/projections)
    def run(name: String): Unit =
      Catalog.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    // a failing query is REPORTED, never silently timed as near-zero —
    // a swallowed throw would let a regression masquerade as a speedup
    val errs = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // per-phase Prof totals captured per pass — emitted (filtered to the
    // declared phase-structured prefixes) so a phase regression is
    // separable from init drift in the artifact itself
    var lastPhases: Map[String, Double] = Map.empty
    def pass(name: String): Double = {
      graft.core.Prof.captureStart()
      val t0 = System.nanoTime()
      try run(name) catch {
        case t: Throwable =>
          errs(name) = t.getClass.getSimpleName + ": " +
            Option(t.getMessage).getOrElse("").replaceAll("\\s+", " ").take(160)
      }
      lastPhases = graft.core.Prof.captureStop()
      val dt = (System.nanoTime() - t0) / 1e9
      // Hygiene AFTER the clock stops, after EVERY pass (not just between
      // queries — r08 shipped PageRank passes growing 5.94→8.01→11.03 s
      // because each pass's localCheckpoint blocks survived into the next
      // pass): drop SQL-cached relations and request a GC so the
      // ContextCleaner releases this pass's persisted / localCheckpoint
      // RDD blocks before the next pass starts. GC time is deliberately
      // NOT charged to the pass.
      spark.catalog.clearCache()
      System.gc()
      dt
    }

    // Passes are INTERLEAVED per query (cold, warm, warm — then the next
    // query) rather than three full sweeps. Two reasons, both observed in
    // driver runs: (a) a transient host-contention phase poisons at most
    // one query's triple, not a whole sweep (r05: q1 read 11.9 s on BOTH
    // full warm sweeps vs 6.7 s cold — min-of-two can't save you when the
    // contended window spans the sweep); (b) warm passes run before the
    // process accumulates 18 queries' worth of shuffle files, codegen
    // cache, and GC pressure. Between queries, cached data is dropped and
    // a GC is requested so one query's working set can't tax the next.
    //
    // Self-diagnosis (r07 verdict: a 2.3x contention outlier shipped
    // silently as the number of record; r08: a cold-faster-than-warm
    // INVERSION went unflagged because only w1 vs w2 were compared):
    // every per-pass time is recorded in the artifact, and two distinct
    // anomaly shapes each trigger one extra tie-break pass plus a marker —
    //   `contended`: the two warm passes disagree by more than 1.5x
    //     (host noise spanning one pass, not the query);
    //   `inverted`: the cold pass beat every warm pass (cold includes
    //     codegen + file listing, so warm > cold means in-process
    //     accumulation or a contended warm window — either way the warm
    //     number is not steady-state).
    // Warm stays the per-query MIN over all warm passes.
    def timedInterleaved(names: Seq[String])
        : (Seq[(String, Double)], Seq[(String, Double)],
           Seq[(String, Seq[Double])], Seq[String], Seq[String],
           Map[String, Map[String, Double]]) = {
      val cold = Seq.newBuilder[(String, Double)]
      val warm = Seq.newBuilder[(String, Double)]
      val passes = Seq.newBuilder[(String, Seq[Double])]
      val contended = Seq.newBuilder[String]
      val inverted = Seq.newBuilder[String]
      val phases = Map.newBuilder[String, Map[String, Double]]
      names.foreach { name =>
        val c = pass(name)
        val w1 = pass(name); val p1 = lastPhases
        val w2 = pass(name); val p2 = lastPhases
        var ws = Seq((w1, p1), (w2, p2))
        if (isContended(w1, w2)) {
          contended += name
          ws = ws :+ (pass(name) -> lastPhases) // tie-break pass
        }
        if (isInverted(c, ws.map(_._1))) {
          // one recovery attempt at a clean warm pass — and the flag
          // stands only if the inversion PERSISTS with it included
          // (accumulation keeps the floor above cold; a recovery back
          // under the margin was window noise — see isInverted)
          ws = ws :+ (pass(name) -> lastPhases)
          if (isInverted(c, ws.map(_._1))) inverted += name
        }
        cold += name -> c
        val (wMin, pMin) = ws.minBy(_._1)
        warm += name -> wMin
        passes += name -> (c +: ws.map(_._1))
        // per-phase decomposition of the pass of record (the warm min),
        // restricted to the declared phase-structured lines' prefixes
        val kept = pMin.filter { case (k, _) => benchPhasePrefixes.exists(k.startsWith) }
        if (kept.nonEmpty) phases += name -> kept
      }
      (cold.result(), warm.result(), passes.result(),
        contended.result(), inverted.result(), phases.result())
    }

    // calibration runs BEFORE the query clock starts, on a clean process:
    // one discarded codegen pass, then the min of two measured passes.
    // It reads no files and touches no SQL cache, so it perturbs nothing
    // the queries measure.
    val calibSec = {
      def onePass(): Double = {
        val t0 = System.nanoTime()
        calibFrame(spark).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val ps = Seq(onePass(), onePass(), onePass())
      spark.catalog.clearCache()
      System.gc()
      calibSummary(ps)
    }

    // file-I/O calibration probe, also off the query clock: setup (the
    // one-time synthetic parquet write) is not timed; passes time
    // read+agg only. Same discipline: discard codegen pass, min of two.
    val calibIoSec = {
      val dir = Files.createTempDirectory("graft-calib-io").toString + "/probe"
      calibIoSetup(spark, dir)
      def onePass(): Double = {
        val t0 = System.nanoTime()
        calibIoFrame(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val ps = Seq(onePass(), onePass(), onePass())
      spark.catalog.clearCache()
      System.gc()
      val s = calibSummary(ps)
      try {
        val p = Paths.get(dir).getParent
        Files.walk(p).sorted(java.util.Comparator.reverseOrder())
          .forEach(f => { Files.deleteIfExists(f); () })
      } catch { case _: Exception => () }
      s
    }

    // per-job-overhead probe, same discipline: first pass warms the
    // scheduler/JIT path and is discarded, min of two measured
    val calibJobSec = {
      val ps = Seq(calibJobPass(spark), calibJobPass(spark), calibJobPass(spark))
      calibSummary(ps)
    }

    // local iteration aid: SPARK_GRAFT_BENCH_ONLY=q1,q2 restricts the set
    // (the driver never sets it, so the round bench always runs everything)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val allNames = if (Catalog.benchNames.nonEmpty) Catalog.benchNames else Catalog.queries.keys.toSeq
    val names = only.fold(allNames)(o => allNames.filter(o))
    val (cold, warm, passes, contended, inverted, phases) = timedInterleaved(names)
    val allErrs = errs.toMap
    def jstr(s: String): String = graft.core.JsonText.str(s)
    def obj(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => jstr(k) + ":" + v }.mkString("{", ",", "}")
    val errObj = allErrs.map { case (k, v) => jstr(k) + ":" + jstr(v) }.mkString("{", ",", "}")
    val passObj = passes.map { case (k, vs) =>
      jstr(k) + ":" + vs.mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val contArr = contended.map(jstr).mkString("[", ",", "]")
    val invArr = inverted.map(jstr).mkString("[", ",", "]")
    val phaseObj = phases.toSeq.sortBy(_._1).map { case (q, ps) =>
      jstr(q) + ":" + ps.toSeq.sorted
        .map { case (k, v) => jstr(k) + ":" + v }.mkString("{", ",", "}")
    }.mkString("{", ",", "}")
    val line =
      s"""{"metric":"total","value":${warm.map(_._2).sum},"unit":"sec",""" +
        s""""queries":${obj(warm)},"cold_total":${cold.map(_._2).sum},""" +
        s""""queries_cold":${obj(cold)},"passes":$passObj,""" +
        s""""contended":$contArr,"inverted":$invArr,"calib_sec":$calibSec,""" +
        s""""calib_io_sec":$calibIoSec,"calib_job_sec":$calibJobSec,""" +
        s""""phases":$phaseObj,""" +
        s""""ok":${allErrs.isEmpty},""" +
        s""""failed":${allErrs.size},"errors":$errObj,"sf":"$sfDir"}"""
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    Files.writeString(Paths.get(outFile), line + "\n")
    println(line)
    System.err.println(line)
    spark.stop()
  }
}
