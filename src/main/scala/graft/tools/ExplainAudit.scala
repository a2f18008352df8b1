package graft.tools

import graft.analytics.Catalog
import graft.core.Engine

/** Plan auditor: prints the formatted physical plan for named catalog
  * queries (default: the bench set) and flags the scale smells the build
  * guide calls out — missing parquet pushdown, unexpected
  * BroadcastNestedLoopJoin / CartesianProduct, and narrow
  * WholeStageCodegen coverage.
  *
  * Usage: runMain graft.tools.ExplainAudit [sfDir] [query ...]
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq else Catalog.benchNames
    val spark = Engine.local("explain-audit", cores = 4)
    names.foreach { n =>
      val df = Catalog.queries(n)(spark, sfDir)
      // execute THIS plan instance so its AQE finalizes (df.count()/write
      // build a fresh QueryExecution and leave this one isFinalPlan=false)
      df.queryExecution.executedPlan.execute().foreachPartition(_ => ())
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      // codegen spans show as `*(n)` in the executed plan's simple form
      val simple = df.queryExecution.executedPlan.toString
      println(s"\n========== $n ==========")
      println(plan)
      val smells = Seq(
        "BroadcastNestedLoopJoin" -> plan.contains("BroadcastNestedLoopJoin"),
        "CartesianProduct" -> plan.contains("CartesianProduct"),
        "no WholeStageCodegen" -> !simple.contains("*("),
        "scan without pushed filters" ->
          (plan.contains("PushedFilters: []") && plan.contains("Filter ("))
      ).collect { case (s, true) => s }
      println(if (smells.isEmpty) s"[audit] $n: clean"
        else s"[audit] $n: SMELLS: ${smells.mkString(", ")}")
    }
    spark.stop()
  }
}
