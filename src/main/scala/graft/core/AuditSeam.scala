package graft.core

import org.apache.spark.sql.DataFrame

/** Plan-audit seam for foreachBatch bodies. The catalog's plan auditor
  * (graft.tools.ExplainAudit) executes each entry's RETURNED DataFrame
  * and runs structural scale checks on it — but the per-micro-batch
  * DataFrames built inside `foreachBatch` lambdas never surface there
  * (the entry returns only the final read-back). Every foreachBatch body
  * in the catalog therefore hands its inner frames through
  * [[report]] before acting on them: a no-op pass-through in production
  * (one volatile read), and the auditor's installed probe when auditing —
  * so single-partition windows, unbounded nested-loop joins and forced
  * fact broadcasts inside the streaming loops are caught by the same
  * checks as batch plans instead of relying on hand review.
  */
object AuditSeam {
  @volatile private var probe: Option[(String, DataFrame) => Unit] = None

  /** Install the auditor's probe (auditor-only; not thread-safe against
    * concurrent installs — the auditor is a single-threaded main).
    */
  def install(p: (String, DataFrame) => Unit): Unit = probe = Some(p)
  def uninstall(): Unit = probe = None

  /** Pass-through report of an inner per-micro-batch frame. `site` names
    * the foreachBatch body and stage ("<entry>/<stage>"). The probe runs
    * SYNCHRONOUSLY, before the caller acts, because the frame's lazy
    * plan can reference snapshot generations that a later merge
    * garbage-collects — auditing it afterwards would read deleted files.
    */
  def report(site: String, df: DataFrame): DataFrame = {
    probe.foreach(f => f(site, df))
    df
  }
}
