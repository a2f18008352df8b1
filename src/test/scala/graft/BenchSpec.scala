package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's anomaly classifiers, pinned to the artifact shapes that
  * motivated them — in particular the r08 PageRank triple that the
  * w1-vs-w2 contention check alone could not flag.
  */
class BenchSpec extends AnyFunSuite {

  test("contended: warm passes disagreeing > 1.5x flag; close passes don't") {
    assert(Bench.isContended(1.0, 1.6))
    assert(Bench.isContended(11.9, 6.7))
    assert(!Bench.isContended(1.0, 1.4))
    assert(!Bench.isContended(4.78, 4.56))
  }

  test("inverted: the r08 PageRank shape flags; healthy shapes don't") {
    // the shipped r08 artifact: 5.94 cold, warm passes 8.01 / 11.03 —
    // warm SLOWER than cold, growing. w1/w2 disagree by only 1.38x, so
    // the contention check stayed silent; the inversion check must fire.
    assert(!Bench.isContended(8.01, 11.03))
    assert(Bench.isInverted(5.94, Seq(8.01, 11.03)))
    // the healthy post-fix shape: cold pays codegen, warms settle below
    assert(!Bench.isInverted(11.6, Seq(4.17, 4.35)))
    assert(!Bench.isInverted(6.75, Seq(4.78, 4.56)))
    // the recovery pass ADJUDICATES (the caller re-evaluates with it
    // included): a persisting floor above cold keeps the flag — the r08
    // accumulation shape grows through its recovery pass —
    assert(Bench.isInverted(3.0, Seq(3.5, 3.4, 3.6)))
    assert(Bench.isInverted(5.94, Seq(8.01, 11.03, 12.1)))
    // — while a recovery back under the margin refutes accumulation and
    // clears it: the r15 forest-cut window ([22.61 cold, 24.88, 24.12],
    // recovery 21.63 — a late-running job-bound line in a fully-warmed
    // JVM has no codegen premium, so its ±8% warm noise band straddles
    // cold; 5 same-JVM warm passes profiled flat, no accumulation)
    assert(Bench.isInverted(22.61, Seq(24.88, 24.12)))
    assert(!Bench.isInverted(22.61, Seq(24.88, 24.12, 21.63)))
    // 5% margin: cold a hair under warm (negligible-codegen query noise)
    // must NOT burn a recovery pass; past the margin it must
    assert(!Bench.isInverted(3.9, Seq(4.0, 4.1)))
    assert(Bench.isInverted(3.7, Seq(4.0, 4.1)))
  }

  test("calibSummary: warmup discarded, min of measured passes; needs >= 2") {
    assert(Bench.calibSummary(Seq(2.5, 1.1, 1.3)) == 1.1)
    assert(Bench.calibSummary(Seq(0.9, 1.1, 1.0)) == 1.0) // warmup ignored even if fastest
    intercept[IllegalArgumentException] { Bench.calibSummary(Seq(1.0)) }
  }

  test("calibFrame: fixed synthetic shuffle+agg with a closed-form total") {
    val spark = graft.core.Engine.local("graft-test", cores = 4)
    // small instance of the same plan: R rows over K keys — sum of all
    // per-key sums is R(R-1)/2 and every key carries R/K values
    val rows = 120000L
    val keys = 1000L
    val got = Bench.calibFrame(spark, rows = rows, keys = keys, parts = 4)
      .agg(org.apache.spark.sql.functions.sum("s").as("ts"),
        org.apache.spark.sql.functions.sum("c").as("tc"),
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("nk"))
      .head()
    assert(got.getLong(0) == rows * (rows - 1) / 2)
    assert(got.getLong(1) == rows)
    assert(got.getLong(2) == keys)
  }

  test("calibIo probe: deterministic parquet content with closed-form sums") {
    // the file-I/O calibration twin: setup writes a fixed synthetic
    // parquet, the timed frame is a scan+single-row aggregate whose
    // values are closed-form — so the probe's correctness (it really read
    // every row) is checkable, not just its wall time
    val spark = graft.core.Engine.local("graft-test", cores = 4)
    val dir = java.nio.file.Files.createTempDirectory("graft-calib-io-spec")
      .toString + "/probe"
    val rows = 100000L
    Bench.calibIoSetup(spark, dir, rows = rows, parts = 4)
    val got = Bench.calibIoFrame(spark, dir).head()
    assert(got.getLong(0) == rows * (rows - 1) / 2)
    // independent driver-side re-derivation of sum(pmod(31*id, 1e6))
    val expectV = (0L until rows).map(i => (i * 31L) % 1000000L).sum
    assert(got.getLong(1) == expectV)
    // setup is idempotent (mode=overwrite): a re-run measures the same bytes
    Bench.calibIoSetup(spark, dir, rows = rows, parts = 4)
    assert(Bench.calibIoFrame(spark, dir).head().getLong(0) == rows * (rows - 1) / 2)
  }

  test("calibJob probe: trivial empty-partition jobs, wall time positive") {
    // the per-job-overhead probe (r14 verdict #7): each job is a
    // 4-task count over empty partitions — zero rows, no shuffle, no
    // files — so the pass measures scheduler/task-launch overhead only.
    // The probe itself asserts the closed-form count per job; here we
    // pin that a pass runs its jobs and reports a sane wall time, and
    // that the artifact key exists in the emitted JSON shape (the main
    // emits "calib_job_sec" next to calib_sec/calib_io_sec).
    val spark = graft.core.Engine.local("graft-test", cores = 4)
    val s = Bench.calibJobPass(spark, jobs = 8, parts = 4)
    assert(s > 0.0 && s < 60.0)
  }

  test("headliner list: the r12 maintained-family entries are benched") {
    // the 25-entry list had been static since r09 while the engine's
    // center of gravity moved to maintained state + serving loops (r11
    // verdict #5) — pin the four additions and the overall floor so a
    // refactor can't silently drop the new core from the round artifact
    val names = graft.analytics.Catalog.benchNames.toSet
    for (n <- Seq("ann_cdc_autosplit_probe", "ann_graph_beam_serve_maintained",
        "idx_cdc_compacted_postings", "agg_stream_serve_cms_decay",
        // r13: the forest cut's marginal-delete regime — the certificate
        // fast path timed per round, not only in stress extras
        "gph_forest_cut_marginal_deletes"))
      assert(names.contains(n), s"maintained-family headliner missing: $n")
    assert(names.size >= 30, s"headliner count regressed: ${names.size}")
  }

  test("bench phases: the forest-cut line decomposes into its lifecycle keys") {
    // the 22 s line is ~80% certificate construction by design (r13
    // verdict #8): the artifact must carry the per-phase split so a
    // probe/skip-path regression is separable from init drift without a
    // ProfileOne session. Pin (a) the prefix list and (b) that the entry
    // actually emits the lifecycle phases under capture.
    assert(Bench.benchPhasePrefixes.contains("forestcut/"))
    val spark = graft.core.Engine.local("graft-test", cores = 4)
    graft.core.Prof.captureStart()
    val n = graft.analytics.Catalog
      .queries("gph_forest_cut_marginal_deletes")(spark, "/root/testdata/sf0.001")
      .count()
    val phases = graft.core.Prof.captureStop()
    assert(n > 0)
    val keys = phases.keySet.filter(_.startsWith("forestcut/"))
    // the marginal-deletes entry's lifecycle is init + delete batches
    // (no insert batch by construction)
    for (k <- Seq("forestcut/init", "forestcut/delete"))
      assert(keys.contains(k), s"missing lifecycle phase $k in $keys")
    assert(phases("forestcut/init") > 0.0)
  }
}
