package graft.core

import org.apache.spark.sql.{DataFrame, Row}

/** Driver-side twin of `Q.regimeGuard`: the few driver collects in the
  * repo are each BOUNDED by construction (a batch-delta cardinality, a
  * config-sized target list, a streamed query-term set) and commented as
  * such — this makes the bound a DECLARED, enforced contract instead of a
  * comment. Collecting through `limit(bound + 1)` means an over-bound
  * input costs one extra row, never an OOM: the driver sees bound + 1
  * rows, fails loudly, and the message carries the remediation lever
  * (what to shard / rebuild / configure) the way the in-plan guards do.
  *
  * 100 TB shape: every call site's bound is independent of total data
  * size (per-batch deltas, config cardinality) — if a scale-up breaks
  * that assumption, this is the diagnostic that says so.
  */
object Bounded {
  def collect(df: DataFrame, bound: Int, site: String, lever: String): Array[Row] = {
    val rows = df.limit(bound + 1).collect()
    if (rows.length > bound)
      sys.error(s"$site: bounded driver collect exceeded its declared " +
        s"operating bound $bound — $lever")
    rows
  }
}
