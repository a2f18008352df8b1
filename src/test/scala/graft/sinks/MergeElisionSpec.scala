package graft.sinks

import graft.SparkSpec

/** Plan-drift detector for the merge-copy elision (r13 verdict #7): the
  * hand-built examples in SnapshotSinkSpec pin isMaterializedShallow's
  * CLASSES, but the thing that must not silently rot is whether the
  * in-tree maintenance loops' ACTUAL per-batch plans remain
  * elision-eligible — a Spark upgrade that wraps analyzed plans in a new
  * node (or a loop refactor that drops a checkpoint) would quietly turn
  * every merge into a defensive localCheckpoint copy, a perf artifact no
  * correctness gate sees. This spec runs representative cache-free
  * maintenance-loop entries with the merge probe installed and asserts
  * each loop's steady-state batches ELIDED at least once. (Not "always":
  * some merges legitimately keep the copy — e.g. a first batch built
  * straight from a parquet scan, or a streaming micro-batch source
  * frame.)
  */
class MergeElisionSpec extends SparkSpec {

  test("every representative maintenance loop's batch plans stay elision-eligible") {
    // entries whose loops pre-materialize their merge batches BY DESIGN
    // (checkpoint once, pass narrow projections/unions of it) — the
    // elision must fire there. Loops that deliberately lean on merge's
    // defensive copy instead (e.g. maintainPostingsBatch, whose batch is
    // one lazy plan evaluated nowhere else) are NOT listed: for them the
    // copy IS the materialization and "no elision" is correct.
    val entries = Seq(
      "idx_cdc_compacted_postings", // compaction inside the loop
      "gph_cdc_components_with_deletes", // labels/postings/edges trio
      "gph_cdc_forest_cut_components") // certificate-maintained CC
    val seen = scala.collection.mutable.Map.empty[String, (Int, Int)]
    SnapshotSink.elisionProbe = Some { (path, elided) =>
      seen.synchronized {
        val (e, k) = seen.getOrElse(path, (0, 0))
        seen(path) = if (elided) (e + 1, k) else (e, k + 1)
      }
    }
    try {
      entries.foreach { name =>
        seen.clear()
        val n = graft.analytics.Catalog.queries(name)(spark, sf0001).count()
        assert(n > 0, s"$name returned no rows")
        assert(seen.nonEmpty, s"$name ran no sink merges — probe broken?")
        val elidedSinks = seen.filter(_._2._1 > 0)
        assert(elidedSinks.nonEmpty,
          s"$name: NO merge elided the defensive copy — the loop's batch " +
            s"plans drifted out of isMaterializedShallow's classes: $seen")
      }
    } finally SnapshotSink.elisionProbe = None
  }
}
