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

  /** Tables whose size scales with the data — a *forced* broadcast of any
    * of these is an OOM at 100x even when it happens to fit today.
    */
  private[graft] val factTables =
    Set("lineitem", "orders", "part", "customer", "supplier")

  /** Queries whose cross product is the algorithm, with a bounded small
    * side: the brute-force baseline (labeled as such), the IVF centroid
    * scorer (C=16 by config), the CROSS JOIN semantics entry (region 5 ×
    * priorities 5), and the recall report (two 1-row aggregates joined).
    * None grows with the corpus.
    */
  private val intentionalCrossProducts =
    Set("sim_cosine_topk_bruteforce", "sim_ivf_ann_topk",
      "join_cross_region_priority", "sim_lsh_recall")

  /** Parquet table names scanned anywhere under a logical subtree. */
  private def scannedTables(
      p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Set[String] =
    p.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.map(_.getName.stripSuffix(".parquet")).toSeq
          case _ => Seq.empty[String]
        }
    }.flatten.toSet

  /** A join side whose optimized `maxRows` is provably ≤ 1 — a global
    * aggregate (scalar threshold / max / average). Broadcasting such a
    * side is correct at ANY scale regardless of which tables feed it:
    * the aggregation reduces the fact scan to one row before the
    * exchange. Catalyst derives maxRows structurally (Aggregate with no
    * grouping keys → Some(1)), so this is a proof, not a size estimate.
    */
  private[graft] def scalarBounded(
      p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean =
    p.maxRows.exists(_ <= 1L)

  /** Fact tables under an explicit BROADCAST hint in the optimized plan.
    * This looks at logical hints, not runtime BroadcastExchanges: an AQE
    * runtime broadcast is size-gated (safe — it degrades to shuffle at
    * scale), while a hint forces the broadcast at any scale. Sides that
    * are scalar-bounded (1-row aggregates over a fact) are exempt.
    */
  private[graft] def forcedFactBroadcasts(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Set[String] = {
    import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, Join}
    plan.collect {
      case j: Join =>
        Seq(j.hint.leftHint -> j.left, j.hint.rightHint -> j.right).collect {
          case (Some(h), side)
              if h.strategy.contains(BROADCAST) && !scalarBounded(side) =>
            scannedTables(side).intersect(factTables)
        }.flatten
    }.flatten.toSet
  }

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
      val factBc = forcedFactBroadcasts(df.queryExecution.optimizedPlan)
      // joins with a provable 1-row-aggregate side (scalar thresholds):
      // their BNLJ is a single-row broadcast, not a blow-up. The filter
      // may have been pushed into the join condition, so account by
      // count: every physical BNLJ/cartesian must be covered by a
      // scalar-bounded logical join.
      val scalarJoins = df.queryExecution.optimizedPlan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join
            if scalarBounded(j.left) || scalarBounded(j.right) => j
      }.size
      // count in the SIMPLE plan string with AQE's "Initial Plan" echo
      // stripped (formatted explain lists nodes twice; AQE's toString
      // repeats the tree as Current + Initial) — one count per operator
      val currentOnly = simple.split("== Initial Plan ==")(0)
      val bnljCount = "BroadcastNestedLoopJoin".r.findAllIn(currentOnly).size +
        "CartesianProduct".r.findAllIn(currentOnly).size
      val allScalarCross = bnljCount > 0 && bnljCount <= scalarJoins
      val bnljOk = intentionalCrossProducts.contains(n) || allScalarCross
      val smells = Seq(
        "BroadcastNestedLoopJoin" ->
          (plan.contains("BroadcastNestedLoopJoin") && !bnljOk),
        "CartesianProduct" -> (plan.contains("CartesianProduct") && !bnljOk),
        "no WholeStageCodegen" -> !simple.contains("*("),
        "scan without pushed filters" ->
          (plan.contains("PushedFilters: []") && plan.contains("Filter (")),
        s"forced broadcast of fact table(s) ${factBc.mkString(",")}" -> factBc.nonEmpty
      ).collect { case (s, true) => s }
      val note =
        if (allScalarCross && plan.contains("BroadcastNestedLoopJoin"))
          " (scalar-bounded cross: 1-row aggregate side)"
        else if (bnljOk && plan.contains("BroadcastNestedLoopJoin"))
          " (bounded-side cross product: documented intentional)"
        else ""
      println(if (smells.isEmpty) s"[audit] $n: clean$note"
        else s"[audit] $n: SMELLS: ${smells.mkString(", ")}")
    }
    spark.stop()
  }
}
